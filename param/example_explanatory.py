# This parameter file enumerates EVERY parameter the framework accepts,
# each set to its default (or an illustrative value, commented as such),
# with an explanation.  It is executable — `python -m concept_tpu -p
# param/example_explanatory.py` runs a small but complete P³M+rungs
# simulation (seconds per step on a TPU chip; ~10-20 min total on a
# single CPU core — switch select_forces to 'pm' for a quick CPU tour).
# Parameter files are ordinary Python, executed with the unit system
# (Mpc, kpc, Gyr, km, s, m_sun, ...) and `h` in scope; they are executed
# twice so forward references like `boxsize = 512*Mpc/h` work even when
# H0 is defined later.  (Counterpart of the reference's
# param/example_explanatory, 560 lines.)


########################
# Input / output       #
########################

# What the simulation contains.  Component-specification dicts are
# realized from the linear Boltzmann layer at a_begin; strings are
# snapshot paths (CONCEPT-HDF5 / GADGET / TIPSY, autodetected); a list
# mixes both freely.
initial_conditions = {
    'species': 'matter',
    'N'      : 16**3,        # particle count (cubes, or 2n³ bcc / 4n³ fcc)
}
# Fluid form: {'species': 'neutrino', 'gridsize': 64,
#              'boltzmann order': 1, 'boltzmann closure': 'class'}

# Where outputs land.  A single string applies to every output kind;
# a dict selects per kind ('snapshot', 'powerspec', 'bispec',
# 'render2D', 'render3D', 'autosave').
output_dirs = 'output/example_explanatory'

# File-name base per output kind (defaults to the kind name).
output_bases = {'snapshot': 'snapshot', 'powerspec': 'powerspec'}

# When to dump.  Top-level keys 'a' (scale factor) and/or 't' (cosmic
# time); values are {kind: times}.  The shorthand without 'a'/'t' means
# scale-factor times.
output_times = {
    'powerspec': [0.3, 1.0],
    'snapshot' : 1.0,
}

# Autosave cadence in wall-clock time; ထ disables.  An interrupted run
# (SIGINT/SIGTERM included) resumes from output/autosave/<param-name>/
# automatically, restoring the COMPLETE Δt-hysteresis state.
autosave_interval = float('inf')     # e.g. 1*hr

# Snapshot format: 'concept' (HDF5, reference-compatible layout) or
# 'gadget' (SnapFormat 1/2 binary).
snapshot_type = 'concept'

# Which components/variables are saved into and loaded from snapshots.
snapshot_select = {
    'save': {'all': {'pos': True, 'mom': True, 'ids': True}},
    'load': {'all': True},
}

# Wrap out-of-bounds particles on snapshot read-in instead of aborting.
snapshot_wrap = False

# GADGET-specific snapshot options.
gadget_snapshot_params = {
    'snapformat': 2,            # SnapFormat 1 or 2
    'dataformat': 32,           # POS/VEL float bits: 32 or 64
    'particles per file': 2**31,
    'header': {},               # header field overrides
}

# Which particle components carry persistent particle IDs.
select_particle_id = {'all': False}

# Ordering of component activations/terminations relative to output
# dumps occurring at the same time (prefixes accepted).
life_output_order = ('terminate', 'activate', 'dump')

# Per-component output selection (keys follow the component-selector
# rules; values are bools or per-artifact flag dicts).
powerspec_select = {'all': {'data': True, 'corrected': True,
                            'linear': True, 'plot': False}}
bispec_select    = {'all': {'data': True, 'reduced': True,
                            'treelevel': True, 'plot': False}}
render2D_select  = {'all': {'data': False, 'image': True,
                            'terminal image': False}}
render3D_select  = {'all': {'image': True}}


########################
# Numerics             #
########################

# Comoving box side length.
boxsize = 64*Mpc

# Particle-mesh options for every mesh-based force.  A bare int is the
# global grid size.
potential_options = {
    'gridsize': {
        'global': {'gravity': {'pm': 16, 'p3m': 32}},
    },
    'interpolation'  : 'CIC',          # NGP/CIC/TSC/PCS or 1/2/3/4
    'deconvolve'     : (True, True),   # (upstream, downstream)
    'interlace'      : False,          # False/'sc', True/'bcc', 'fcc';
                                       # or a (upstream, downstream) pair
    'differentiation': 'fourier',      # 'fourier' or stencil order 2/4/6/8
}

# Ewald correction table resolution for the 'pp' method (disk-cached).
ewald_gridsize = 64

# P³M long/short force split.  Expressions may use boxsize, gridsize
# (the P³M mesh) and scale.
shortrange_params = {
    'gravity': {
        'scale': '1.25*boxsize/gridsize',
        'range': '4.5*scale',
    },
}

# Power-spectrum measurement (a bare int = {'gridsize': ...}).
powerspec_options = {
    'gridsize'     : 32,
    'interpolation': 'PCS',
    'interlace'    : True,
    'plot'         : False,
}

# Bispectrum measurement: named triangle family + resolution.
bispec_options = {
    'configuration': 'equilateral 10',
    'gridsize'     : 16,
}

# Anti-aliased cell-shell overlap weights for the bispectrum shells
# (False: binary in/out shells).
bispec_antialiasing = True


########################
# Cosmology            #
########################

H0  = 67*km/(s*Mpc)
Ωb   = 0.049      # ASCII Omega_b also accepted
Ωcdm = 0.27       # ASCII Omega_cdm also accepted

# Start of the simulation (scale factor, or t_begin in cosmic time).
a_begin = 0.02

# Primordial curvature power spectrum ζ: amplitude, tilt, running,
# pivot scale.
primordial_spectrum = {
    'A_s'  : 2.1e-9,
    'n_s'  : 0.96,
    'α_s'  : 0.0,            # alpha_s also accepted
    'pivot': 0.05/Mpc,
}

# CLASS-style passthrough parameters: massive neutrinos (N_ncdm,
# deg_ncdm, m_ncdm [eV]), decaying CDM (Gamma_dcdm [km/s/Mpc]), ...
class_params = {}

# Use CLASS for the background evolution when classy is installed
# (False: the internal matter+Λ+ν Friedmann solver).
enable_class_background = False

# Linear Boltzmann backend for transfer functions: 'auto' (classy when
# installed, else the internal Einstein-Boltzmann solver for
# species-resolved runs, else Eisenstein-Hu), or force 'class' / 'eb' /
# 'eh' explicitly.
boltzmann_backend = 'auto'

# Internal Einstein-Boltzmann solver options.
boltzmann_options = {
    'modes_per_decade': 10,    # k sampling density
    'rtol'            : 1e-5,  # hierarchy integration tolerance
    # 'k_min'/'k_max', 'l_max_g', 'l_max_ur', 'l_max_ncdm', 'n_q',
    # 'cache_dir' (.reusable/eb) also accepted
}


########################
# Physics              #
########################

# Force method per component.  Methods: 'pm', 'p3m', 'pp' (direct
# pairwise with Ewald periodic corrections), 'ppnonperiodic'; the
# 'lapse' force applies the decaying-species GR correction.
select_forces = {
    'matter': {'gravity': 'p3m'},
    'all'   : {'gravity': 'pm'},
}

# Equation of state per component: 'class' (tables / exact Fermi-Dirac
# for massive ν), 'default', a number, or an expression in a.
select_eos_w = {'all': 'default'}

# Boltzmann hierarchy truncation per component (fills components whose
# initial_conditions entry does not specify it).
select_boltzmann_order   = {'all': 1}
select_boltzmann_closure = {'all': 'truncate'}   # or 'class'

# Approximations per component.
select_approximations = {'all': {'P=wρ': False}}

# Component lifetimes (a_activate, a_terminate): activation realizes
# the component mid-run at exactly that a; termination removes it.
select_lives = {'all': (0, float('inf'))}

# Gravitational softening: per-component length expression (boxsize and
# N in scope) and kernel shape ('spline' = GADGET-2 cubic spline,
# exactly Newtonian beyond 2.8ε; or 'plummer').
select_softening_length = {'particles': '0.025*boxsize/cbrt(N)'}
softening_kernel = 'spline'

# Realization details: LPT order (1/2/3), Orszag-3/2 dealiasing of the
# quadratic/cubic LPT products, local-type non-Gaussianity, gauge.
realization_options = {
    'lpt'           : 2,
    'dealias'       : False,
    'nongaussianity': 0.0,      # f_NL
    'gauge'         : 'nbody',  # 'nbody' | 'synchronous' | 'newtonian'
    'backscale'     : False,    # z=0 spectrum scaled back by D1(a)
}


########################
# Simulation           #
########################

# Global time-step limiter scalings (reference Appendix-A factors) and
# the Δa bounds (early: a < 0.1).
Δt_base_background_factor = 1    # Delta_t_... also accepted
Δt_base_nonlinear_factor  = 1
Δa_max_early = 0.00153
Δa_max_late  = 0.022

# Adaptive rungs: power-of-two short-range sub-cycling per particle.
# N_rungs = 1 disables rungs (global stepping); the rung criterion is
# Δt_rung = √(2·0.025·Δt_rung_factor·ε/|a⃗|).
N_rungs = 8
Δt_rung_factor = 1

# Static time stepping: a path to an (a, Δa) record — an existing file
# is replayed exactly, a fresh path records this run; or a callable
# a ↦ Δa.
static_timestepping = None

# Primordial noise: counter-based and mode-indexed, so realizations are
# independent of the device count AND of the grid size.
random_seeds = {
    'primordial amplitudes': 0,
    'primordial phases'    : 0,
}
primordial_amplitude_fixed = False   # |δ(k)| pinned to √P(k)
primordial_phase_shift     = 0       # π for the paired simulation
primordial_noise_imprinting = 'simple'   # or 'distributed'

# Grid discretization convention (cell centers vs vertices).
cell_centered = True

# Fluid solver per component and scheme options.
fluid_scheme_select = {'all': 'kurganovtadmor'}   # or 'maccormack'
fluid_options = {
    'Kurganov-Tadmor': {
        'Runge-Kutta order'  : {'all': 2},
        'flux_limiter_select': {'all': 'mc'},
    },
    'MacCormack': {
        'vacuum_corrections'    : {'all': True},
        'max_vacuum_corrections': {'all': 2},
        'smoothing'             : {'all': 1.0},
    },
}


########################
# Graphics             #
########################

render2D_options = {
    'axis'               : 'z',
    'extent'             : (0, boxsize),
    'terminal resolution': 80,
    'colormap'           : 'inferno',
    'enhancement'        : True,
}
render3D_options = {
    'elevation' : 30,
    'azimuth'   : -60,
    'zoom'      : 1.0,
    'color'     : None,       # per-component colormap override
    'background': 'black',
    'resolution': 1080,
}


########################
# Units                #
########################

unit_length = 'Mpc'
unit_time   = 'Gyr'
unit_mass   = '10**10 m_sun'


########################
# Debugging            #
########################

enable_Hubble = True            # False: static universe (a ≡ 1)
enable_float64 = False          # True: float64 end-to-end (validation)
print_load_imbalance = True
terminal_width = 80
enable_terminal_formatting = True
suppress_output = set()        # regexes; matching output lines vanish

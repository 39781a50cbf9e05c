# Matter particles + a non-linear massive-neutrino fluid
# (counterpart of the reference's param/example_nonlinnu).

# Non-parameter variable used to control the size of the simulation
_size = 80

# Input/output
initial_conditions = [
    # Matter component
    {
        'species': 'matter',
        'N'      : _size**3,
    },
    # Neutrino component
    {
        'species'        : 'neutrino',
        'gridsize'       : _size//2,  # Small neutrino grid
        'boltzmann order': 1,         # Non-linear energy and momentum density
    },
]
output_dirs  = 'output/example_nonlinnu'
output_times = {'powerspec': [a_begin, 1]}

# Numerics
boxsize = 200*Mpc/h
potential_options = _size//2  # PM grid size

# Cosmology
H0   = 67*km/(s*Mpc)
Ωb   = 0.049
Ωcdm = 0.27 - 0.011  # fix Ωcdm + Ων ≈ 0.27 (Σmν = 0.5 eV ⇒ Ων ≈ 0.011)
a_begin = 0.02
primordial_spectrum = {
    'A_s': 2.1e-9,  # amplitude
    'n_s': 0.96,    # tilt
}
class_params = {
    # 3-times degenerate neutrino hierarchy, Σmν = 0.5 eV
    'N_ur'    : 0,
    'N_ncdm'  : 1,
    'deg_ncdm': 3,
    'm_ncdm'  : 0.5/3,
}

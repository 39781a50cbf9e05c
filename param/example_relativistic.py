# Matter particles in ΛCDM plus a completely linear component supplying
# relativistic (radiation) corrections — counterpart of the reference's
# param/example_relativistic (boltzmann order −1: grids re-realized from
# linear theory each kick, affecting the others only gravitationally).

# Non-parameter variable used to control the size of the simulation
_size = 128

# Input/output
initial_conditions = [
    # Matter component
    {
        'species': 'matter',
        'N'      : _size**3,
    },
    # Linear component
    {
        'name'             : 'linear',
        'species'          : 'radiation',
        'gridsize'         : _size,
        'boltzmann order'  : -1,       # Completely linear component
        'boltzmann closure': 'class',
    },
]
output_dirs  = 'output/example_relativistic'
output_times = {'powerspec': [a_begin, 0.5, 1]}
powerspec_select = {'matter': True}

# Numerics
boxsize = 1024*Mpc
potential_options = _size  # PM grid size

# Cosmology
H0   = 67*km/(s*Mpc)
Ωb   = 0.049
Ωcdm = 0.27
a_begin = 0.01
primordial_spectrum = {
    'A_s': 2.1e-9,  # amplitude
    'n_s': 0.96,    # tilt
}

# Simulation
primordial_amplitude_fixed = True  # fixed-amplitude primordial noise

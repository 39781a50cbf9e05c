# Matter-only ΛCDM simulation with on-the-fly initial conditions and a
# present-day power spectrum (the counterpart of the reference's
# param/example_basic).

# Input/output
initial_conditions = {
    'species': 'matter',
    'N'      : 64**3,
}
output_dirs  = 'output/example_basic'
output_times = {'powerspec': 1.0}

# Numerics
boxsize = 256*Mpc/h
potential_options = 128  # P³M grid size

# Cosmology
H0   = 67*km/(s*Mpc)
Ωb   = 0.049
Ωcdm = 0.27
a_begin = 0.02
primordial_spectrum = {
    'A_s': 2.1e-9,  # amplitude
    'n_s': 0.96,    # tilt
}

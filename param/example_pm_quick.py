# Quick PM-only demo: small box, all output kinds, finishes in seconds.

initial_conditions = {'species': 'matter', 'N': 32**3}
output_dirs  = 'output/example_pm_quick'
output_times = {
    'powerspec': [0.1, 0.3, 1.0],
    'snapshot' : 1.0,
    'render2D' : 1.0,
    'render3D' : 1.0,
    'bispec'   : 1.0,
}
boxsize = 128*Mpc/h
potential_options = {
    'gridsize': 64,
    'interlace': True,
}
select_forces = {'all': {'gravity': 'pm'}}
H0   = 67*km/(s*Mpc)
Ωb   = 0.049
Ωcdm = 0.27
a_begin = 0.02
primordial_spectrum = {'A_s': 2.1e-9, 'n_s': 0.96}
realization_options = {'lpt': 2}
render2D_options = {'terminal image': False, 'colormap': 'inferno'}

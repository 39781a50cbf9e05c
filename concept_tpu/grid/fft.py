"""Distributed 3D real FFTs over a JAX device mesh.

TPU-native replacement for the reference's FFTW3-MPI slab FFT
(reference: src/fft.c:105-290 and mesh.py:3769-4181).  The reference uses
x-slabs in real space and transposed y-slabs in Fourier space
(fft.c:34-73); here the same dataflow is expressed as a shard_map pencil
FFT: the real grid is sharded along axis 0, the Fourier grid along axis 1,
and the x↔y transpose is a single ``all_to_all`` riding the ICI.

No FFTW wisdom is needed — XLA compiles the FFT once per shape.

Layouts (global logical shapes):
  real    : (n, n, n)          sharded P('x', None, None)
  fourier : (n, n, n//2+1)     sharded P(None, 'x', None)   [transposed]
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


@dataclass(frozen=True)
class GridDistribution:
    """How grids are laid out over devices.

    mesh=None means single-device (plain jnp.fft).  Otherwise grids are
    sharded over mesh axis ``axis`` (1D slab decomposition; the analogue of
    the reference's domain/slab decomposition, communication.py:692 and
    mesh.py:2138-2467 — but re-sharding is a single all_to_all instead of
    chunked Isend/Recv).
    """

    mesh: Mesh | None = None
    axis: str = "x"

    @property
    def n_devices(self) -> int:
        if self.mesh is None:
            return 1
        return self.mesh.shape[self.axis]

    def real_spec(self):
        return P(self.axis, None, None)

    def fourier_spec(self):
        return P(None, self.axis, None)

    def real_sharding(self):
        return jax.sharding.NamedSharding(self.mesh, self.real_spec())

    def fourier_sharding(self):
        return jax.sharding.NamedSharding(self.mesh, self.fourier_spec())


@dataclass(frozen=True)
class GridDistribution2D:
    """2D pencil decomposition over a (axis_a × axis_b) device mesh.

    Lifts the 1D slab limit n_devices ≤ gridsize (reference fft.c:34-73;
    SURVEY §5.7 prescribes pencils to scale past it): the real grid is
    sharded over BOTH leading axes, P(a, b, None) — z-pencils — and the
    Fourier grid over P(None, a, b) after two all_to_all transposes.  The
    rfft's odd n/2+1 innermost extent is zero-padded to a multiple of the
    b-axis size inside the kernel (sliced back on output).
    """

    mesh: Mesh
    axis_a: str = "x"
    axis_b: str = "y"

    @property
    def n_devices(self) -> int:
        return self.mesh.shape[self.axis_a] * self.mesh.shape[self.axis_b]

    def nk_pad(self, n: int) -> int:
        p2 = self.mesh.shape[self.axis_b]
        nk = n // 2 + 1
        return ((nk + p2 - 1) // p2) * p2

    def real_spec(self):
        return P(self.axis_a, self.axis_b, None)

    def fourier_spec(self):
        return P(None, self.axis_a, self.axis_b)

    def real_sharding(self):
        return jax.sharding.NamedSharding(self.mesh, self.real_spec())

    def fourier_sharding(self):
        return jax.sharding.NamedSharding(self.mesh, self.fourier_spec())


def _rfft3_pencil(grid, dist: GridDistribution2D):
    """2D-pencil forward rfft: P(a,b,None) → P(None,a,b) with the padded
    innermost axis sliced back to n//2+1."""
    n = grid.shape[0]
    a, b = dist.axis_a, dist.axis_b
    nk = n // 2 + 1
    nkp = dist.nk_pad(n)

    def kernel(local):
        # local: (n/p1, n/p2, n) — z complete
        f = jnp.fft.rfft(local, axis=2)  # (n/p1, n/p2, nk)
        f = jnp.pad(f, ((0, 0), (0, 0), (0, nkp - nk)))
        # y-transpose within b-groups: split z, concat y
        f = jax.lax.all_to_all(f, b, split_axis=2, concat_axis=1, tiled=True)
        f = jnp.fft.fft(f, axis=1)  # y complete
        # x-transpose within a-groups: split y, concat x
        f = jax.lax.all_to_all(f, a, split_axis=1, concat_axis=0, tiled=True)
        f = jnp.fft.fft(f, axis=0)  # x complete
        return f  # (n, n/p1, nkp/p2)

    out = shard_map(
        kernel, mesh=dist.mesh,
        in_specs=(dist.real_spec(),), out_specs=dist.fourier_spec(),
    )(grid)
    return out[:, :, :nk]


def _irfft3_pencil(slab, gridsize: int, dist: GridDistribution2D):
    n = gridsize
    a, b = dist.axis_a, dist.axis_b
    nk = n // 2 + 1
    nkp = dist.nk_pad(n)
    slab = jnp.pad(slab, ((0, 0), (0, 0), (0, nkp - nk)))

    def kernel(local):
        # local: (n, n/p1, nkp/p2)
        f = jnp.fft.ifft(local, axis=0)
        f = jax.lax.all_to_all(f, a, split_axis=0, concat_axis=1, tiled=True)
        f = jnp.fft.ifft(f, axis=1)
        f = jax.lax.all_to_all(f, b, split_axis=1, concat_axis=2, tiled=True)
        f = f[:, :, : n // 2 + 1]
        return jnp.fft.irfft(f, n=n, axis=2)

    return shard_map(
        kernel, mesh=dist.mesh,
        in_specs=(dist.fourier_spec(),), out_specs=dist.real_spec(),
    )(slab)


def rfft3(grid, dist: GridDistribution | None = None):
    """Forward real 3D FFT.

    grid: (n, n, n) real, sharded P('x',None,None) when distributed.
    Returns: (n, n, n//2+1) complex, sharded P(None,'x',None).
    """
    if dist is None or dist.mesh is None:
        return jnp.fft.rfftn(grid)
    if isinstance(dist, GridDistribution2D):
        return _rfft3_pencil(grid, dist)

    ax = dist.axis

    def kernel(local):
        # local: (n/d, n, nk_real) real block
        # 1) rfft along z, fft along y (both locally complete)
        f = jnp.fft.rfft(local, axis=2)
        f = jnp.fft.fft(f, axis=1)
        # 2) transpose x<->y over ICI: split y, concat x
        f = jax.lax.all_to_all(f, ax, split_axis=1, concat_axis=0, tiled=True)
        # now (n, n/d, nk): x locally complete, y sharded
        # 3) fft along x
        f = jnp.fft.fft(f, axis=0)
        return f

    return shard_map(
        kernel,
        mesh=dist.mesh,
        in_specs=(dist.real_spec(),),
        out_specs=dist.fourier_spec(),
    )(grid)


def irfft3(slab, gridsize: int, dist: GridDistribution | None = None):
    """Inverse of :func:`rfft3` (normalized like jnp.fft.irfftn)."""
    if dist is None or dist.mesh is None:
        return jnp.fft.irfftn(slab, s=(gridsize, gridsize, gridsize))
    if isinstance(dist, GridDistribution2D):
        return _irfft3_pencil(slab, gridsize, dist)

    ax = dist.axis

    def kernel(local):
        # local: (n, n/d, nk) complex
        f = jnp.fft.ifft(local, axis=0)
        # transpose back: split x, concat y
        f = jax.lax.all_to_all(f, ax, split_axis=0, concat_axis=1, tiled=True)
        # now (n/d, n, nk)
        f = jnp.fft.ifft(f, axis=1)
        f = jnp.fft.irfft(f, n=gridsize, axis=2)
        return f

    return shard_map(
        kernel,
        mesh=dist.mesh,
        in_specs=(dist.fourier_spec(),),
        out_specs=dist.real_spec(),
    )(slab)

"""Multi-device serving for the fused map-fitting path.

The physics operators are voxel-parallel with zero cross-voxel
communication (SURVEY §5: the voxel axis nv=H·W is the domain's
"sequence" axis), so serving scales embarrassingly over the mesh: no
collectives are emitted at all — each device fits its shard of slices
(or of rows of one large volume) independently. Pallas kernels are not
auto-partitioned by GSPMD, so the kernel is wrapped in `shard_map`,
which hands each device its local block.

Two layouts:

- slice sharding (default): the leading (nb) axis of the planar buffers
  is split over 'data' — the production batch-serving path
  (reference analog: ROI-realPhantom.py's per-slice eval loop, one
  slice at a time on one device).
- voxel sharding (`voxel_axis=True`): the H axis is split instead, for
  fitting a single oversized volume whose slices don't fill the mesh
  (nb < n_devices) or don't fit one device's HBM.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .. import ops as kops


def make_sharded_fit(mesh: Mesh, voxel_axis: bool = False, **fit_kw):
    """Jitted `fit_rho_planar` sharded over the mesh's 'data' axis.

    Returns fn(s_re, s_im, phi, r2s, te) -> (rho_re, rho_im) with the
    same shapes/semantics as `ops.fit_rho_planar`. With slice sharding,
    nb must divide by the mesh size and `te` is per-slice (leading nb
    axis, sharded alongside); with voxel sharding, H must divide and
    `te` is replicated.

    Pass `uniform_te=True` (kwarg) for the phasor-recurrence fast path —
    inside shard_map `te` is traced, so the automatic uniform-spacing
    detection conservatively disables it.
    """
    n = mesh.shape["data"]
    if voxel_axis:
        planar = P(None, None, "data", None)   # (nb, ne/ns, H, W)
        maps = P(None, "data", None)           # (nb, H, W)
        in_specs = (planar, planar, maps, maps, P())
        out_specs = (planar, planar)
    else:
        b = P("data")
        in_specs = (b, b, b, b, b)
        out_specs = (b, b)

    def fit(s_re, s_im, phi, r2s, te):
        return kops.fit_rho_planar(s_re, s_im, phi, r2s, te, **fit_kw)

    # check_vma=False: pallas_call out_shapes carry no vma annotation
    sharded = shard_map(fit, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, check_vma=False)

    @jax.jit
    def run(s_re, s_im, phi, r2s, te):
        ax = 2 if voxel_axis else 0
        if s_re.shape[ax] % n:
            raise ValueError(
                f"axis {ax} ({s_re.shape[ax]}) must divide the "
                f"{n}-device 'data' mesh")
        return sharded(s_re, s_im, phi, r2s, te)

    return run

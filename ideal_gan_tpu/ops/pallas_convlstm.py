"""Fused Pallas TPU kernel for the multi-echo ConvLSTM front.

The ME-ConvLSTM (models/convlstm.py; reference keras ConvLSTM2D at
DLlib/module.py:370, 592, 800) is ~2/3 of every me_layer trainer step at
reference widths (docs/DESIGN.md round-4 attribution). Run as XLA ops,
each echo's hidden/cell state round-trips HBM — and the optimized HLO
shows XLA lays the F-channel state out as `[8,384,384,F]{3,0,2,1}` with
F channels padded to 128 lanes, so at F=32 every state tensor moves 4×
its logical bytes.

This kernel runs the ENTIRE recurrence per spatial block with the state
resident in VMEM. Mosaic-compatible layout choices, found empirically
(each rejected form is a real Mosaic error class):

- **Channel-first, spatially-flat 2-D tensors.** Every in-kernel tensor
  is (channels, M) with M = R·W′ the flattened padded block. Channels
  sit in sublanes, M in lanes — no 128-lane padding waste on the minor
  dimension, which is exactly the XLA-layout pathology this kernel
  exists to avoid.
- **Tap shifts via pltpu.roll.** For tap (dy, dx) the conv needs
  inp[i+dy, j+dx] aligned to [i, j]; in flat index space that is a roll
  by −(dy·W′+dx). `jnp.roll` is unusable: its slice+concat lowering
  emits a zero-size slice at shift 0 ("vector types must have positive
  constant sizes"). pltpu.roll results carry a lazy lane offset that
  elementwise ops and matmul operands accept, but `tpu.concatenate`
  rejects ("result/input offset mismatch on non-concat dimension") — so
  rolled tensors are fed DIRECTLY to per-tap matmuls, never stacked.
  Roll wrap-around writes garbage into the outermost rows/cols of the
  block — the halo of `ne` pixels absorbs it: taint grows 1 px per
  echo and the central TH×W rows sit exactly `ne` deep. (The same halo
  simultaneously absorbs cross-block conv influence, so blocks are
  independent.)
- **Per-tap matmuls over the merged input.** Each echo concatenates
  x_e and hidden once (both offset-0 — legal), then accumulates
  gates += (4F, Cin+F) @ roll(inp, s_tap) over the nine taps. K = Cin+F
  (34 at F=32) underfills the 128-lane MXU K dimension; the win is HBM
  bytes (state never leaves VMEM), not MXU fill.
- SAME-padding semantics at image borders are preserved by zeroing the
  state outside the true image after every echo; the input window is
  zero-padded by the same halo on the host side.

HBM traffic: x once in, final hidden once out — vs (gates + state) × ne
echoes round-tripping for the XLA path.

Backward: `convlstm_fused` is a jax.custom_vjp that saves only
(x, k, bias). The backward re-runs the recurrence in XLA to rebuild the
per-echo states (plain rematerialization), then a hand-written reverse
sweep re-linearizes each single echo around the recomputed previous
state — no O(ne·4F) gate residuals held across the loss computation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .partition import dp_partitioned

_TAPS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _use_fused() -> bool:
    """Fused path on TPU, or anywhere with IDEAL_GAN_CONVLSTM_FUSED=force
    (interpret-mode kernels — used by the CPU-mesh partitioning tests)."""
    return (_on_tpu()
            or os.environ.get("IDEAL_GAN_CONVLSTM_FUSED") == "force")


def _act_fn(name):
    from ..models.blocks import get_activation
    return get_activation(name)


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _roll(a, shift):
    """Circular shift along the flat (lane) axis 1. Uses pltpu.roll —
    Mosaic's native lane rotation — with an identity fast-path at 0
    (jnp.roll's shift-0 lowering emits a zero-size slice Mosaic
    rejects). bf16 rotates in f32: Mosaic's bf16 tpu.dynamic_rotate
    crashes the compiler outright (helper exit 1; probed op-by-op —
    bf16 dot/concat/select are fine, roll is the one that dies)."""
    shift %= a.shape[1]
    if shift == 0:
        return a
    if a.dtype == jnp.bfloat16:
        return pltpu.roll(a.astype(jnp.float32), shift=shift,
                          axis=1).astype(jnp.bfloat16)
    return pltpu.roll(a, shift=shift, axis=1)


def _block_shape(h: int, w: int, ne: int, f: int, cin: int,
                 itemsize: int):
    """(row-tile, col-tile) maximizing halo efficiency
    th·wc / ((th+2ne)(wc+2ne)) under the VMEM budget.

    Blocking BOTH dims matters: a full-width 384-row strip with the
    ne=6 halo costs ≥ 5148 lane positions, which caps th at 1–8 and
    wastes 4–13× the compute on halo. A (th, 128) column block reaches
    ~60–66 % efficiency at the same VMEM. Budget: 9 MiB of the 16 MiB
    VMEM — an 11 MiB estimated working set crashes the TPU compile
    helper; the estimate below undercounts Mosaic's true liveness
    (rolled temporaries), so it is deliberately conservative."""
    budget = 9 * 2 ** 20
    per_m = (4 * f * 4                       # gates accumulator (f32)
             + 4 * f * 4                     # activation temps (f32)
             + f * 4                         # cellf (f32)
             + 2 * (cin + f) * itemsize      # inp + rolled copy
             + 3 * (cin + f) * itemsize     # dy-row stack scratch
             + 2 * f * itemsize              # hidden + cell
             + 2 * f * itemsize              # out block (dbl-buffered)
             + 2 * ne * cin * itemsize)      # x window (dbl-buffered)
    best = None
    for wc in (128, 192, 96, 256, 64, w):
        if wc > w or w % wc:
            continue
        for th in (64, 48, 32, 24, 16, 12, 8, 6, 4, 3, 2, 1):
            if h % th:
                continue
            m = (th + 2 * ne) * (wc + 2 * ne)
            if m * per_m > budget:
                continue
            eff = (th * wc) / m
            if best is None or eff > best[0]:
                best = (eff, th, wc)
            break  # smaller th only lowers efficiency for this wc
    if best is None:
        return None  # no block fits the VMEM budget (callers fall back)
    return best[1], best[2]


def fused_viable(h, w, ne, f, cin, itemsize, bwd=True,
                 min_fwd_eff=0.0) -> bool:
    """Whether the fused kernels have a VMEM-viable spatial block at
    this config. The block searches return None when even the smallest
    block exceeds the budget — e.g. the backward at F=72 (the sup/teaug
    reference width), whose per-position working set (state stacks +
    dgates temps) leaves no feasible (th, wc). Emitting the kernel
    anyway produces a ~50 MB working set that HANGS the TPU compile
    helper (round-5 incident: wedged the tunnel for 30+ min), so
    `models/convlstm.py` gates on this and `convlstm_pallas`/
    `convlstm_bwd_pallas` raise loudly instead of compiling.

    min_fwd_eff: additionally require the forward block's halo
    efficiency th·wc/((th+2ne)(wc+2ne)) to reach this floor. The fused
    forward wins where the block search lands above ~0.5 (F=32 f32:
    0.61, measured 1.90×; F=36 bf16: 0.67, 1.67×) and LOSES where VMEM
    pressure shrinks it below (F=72 f32: 0.34 — measured 0.52× on the
    e2e VET-Net serving path), so the forward-only serving opt-in
    passes 0.5 here."""
    blk = _block_shape(h, w, ne, f, cin, itemsize)
    if blk is None:
        return False
    if min_fwd_eff:
        th, wc = blk
        eff = (th * wc) / ((th + 2 * ne) * (wc + 2 * ne))
        if eff < min_fwd_eff:
            return False
    if bwd and _block_shape_bwd(h, w, ne, f, cin, itemsize) is None:
        return False
    return True


def _fwd_kernel(act_name, rec_act_name, ne, th, wc, halo, h_true, w_true,
                f, stacked, x_ref, k_ref, b_ref, out_ref, stack_ref):
    """One grid cell: the full ne-echo recurrence on a flattened
    (th+2ne)×(wc+2ne) block.

    x_ref:  (1, 1, 1, ne, Cin, M) input window, channel-first flat
    k_ref:  (3, 4F, 3(Cin+F)) per-dy-row kernel (dx taps concatenated on
            K) when `stacked`, else (9, 4F, Cin+F) per-tap (_TAPS order)
    b_ref:  (4F, 1)
    out_ref: (1, 1, 1, F, M) final hidden (full padded block; host crops)
    stack_ref: (3(Cin+F), M) VMEM scratch when `stacked` — rolled copies
            are STORED here (stores materialize the lazy roll offset,
            which tpu.concatenate cannot), giving a K=3(Cin+F)
            contraction (~80 % MXU K-fill at F=32 vs ~27 % per-tap)
    """
    act = _act_fn(act_name)
    rec_act = _act_fn(rec_act_name)
    i_blk = pl.program_id(1)
    j_blk = pl.program_id(2)
    dtype = x_ref.dtype
    r = th + 2 * halo
    wp = wc + 2 * halo
    m = r * wp

    # validity mask over flat positions: inside the true image?
    pos = lax.broadcasted_iota(jnp.int32, (1, m), 1)
    grow = pos // wp + i_blk * th
    gcol = pos - (pos // wp) * wp + j_blk * wc
    # f32: the gate math runs in f32 regardless of the storage dtype
    # (Mosaic's bf16 logistic lowering is broken — f32 scalar broadcast
    # into a bf16 vector — and f32 gates are better numerics anyway)
    mask = ((grow >= halo) & (grow < h_true + halo)
            & (gcol >= halo) & (gcol < w_true + halo)).astype(jnp.float32)

    bias = b_ref[...].astype(jnp.float32)     # (4F, 1)

    hidden = jnp.zeros((f, m), dtype)
    cell = jnp.zeros((f, m), dtype)

    for e in range(ne):
        x_e = x_ref[0, 0, 0, e]               # (Cin, M)
        # one offset-0 concat per echo; rolled copies feed matmuls
        # (or scratch stores) only
        inp = jnp.concatenate([x_e, hidden], axis=0)
        gates = jnp.broadcast_to(bias, (4 * f, m))
        if stacked:
            c = inp.shape[0]
            for i_dy, dy in enumerate((-1, 0, 1)):
                row = _roll(inp, -dy * wp)
                # roll(row, -dx)[p] = inp[p + dy*wp + dx]
                stack_ref[0:c] = _roll(row, 1)
                stack_ref[c:2 * c] = row
                stack_ref[2 * c:] = _roll(row, -1)
                gates = gates + jnp.dot(
                    k_ref[i_dy], stack_ref[...],
                    preferred_element_type=jnp.float32)
        else:
            for t, (dy, dx) in enumerate(_TAPS):
                gates = gates + jnp.dot(
                    k_ref[t], _roll(inp, -(dy * wp + dx)),
                    preferred_element_type=jnp.float32)
        gi = rec_act(gates[:f])
        gf = rec_act(gates[f:2 * f])
        gg = act(gates[2 * f:3 * f])
        go = rec_act(gates[3 * f:])
        cellf = (gf * cell.astype(jnp.float32) + gi * gg) * mask
        hidden = (go * act(cellf) * mask).astype(dtype)
        cell = cellf.astype(dtype)

    out_ref[0, 0, 0] = hidden


def _prep(x, k_merged, bias, th, wc, stacked):
    """Host-side (XLA) packing: flattened channel-first block windows +
    tap-major (or dy-row-stacked) kernel layout."""
    nb, ne, h, w, cin = x.shape
    f = k_merged.shape[-1] // 4
    halo = ne
    r = th + 2 * halo
    wp = wc + 2 * halo
    nh = h // th
    nw = w // wc
    dtype = x.dtype

    xp = jnp.pad(x, ((0, 0), (0, 0), (halo, halo), (halo, halo), (0, 0)))
    windows = jnp.stack(
        [jnp.stack([xp[:, :, i * th:i * th + r, j * wc:j * wc + wp]
                    for j in range(nw)], axis=1)
         for i in range(nh)], axis=1)       # (nb, nh, nw, ne, R, W', Cin)
    windows = windows.transpose(0, 1, 2, 3, 6, 4, 5)  # channel-first
    windows = windows.reshape(nb, nh, nw, ne, cin, r * wp)

    # tap roll −(dy·wp+dx) aligns inp[p + dy·wp + dx] to position p, so
    # the tap weight for offset (dy, dx) is k[dy+1, dx+1]
    if stacked:
        # stack rows are [roll(row,+1) → dx=−1, row → dx=0,
        # roll(row,−1) → dx=+1]
        k_mat = jnp.stack(
            [jnp.concatenate([k_merged[dy + 1, 0].T, k_merged[dy + 1, 1].T,
                              k_merged[dy + 1, 2].T], axis=1)
             for dy in (-1, 0, 1)], axis=0).astype(dtype)  # (3, 4F, 3C)
    else:
        k_mat = jnp.stack([k_merged[dy + 1, dx + 1].T for dy, dx in _TAPS],
                          axis=0).astype(dtype)       # (9, 4F, Cin+F)
    b2 = bias.reshape(4 * f, 1).astype(dtype)
    return windows, k_mat, b2


def _crop(flat, nb, nh, nw, th, wc, halo, chans):
    """(nb, nh, nw, C, R·W′) padded-block stack → (nb, H, W, C)."""
    r = th + 2 * halo
    wp = wc + 2 * halo
    blocks = flat.reshape(nb, nh, nw, chans, r, wp)
    blocks = blocks[:, :, :, :, halo:halo + th, halo:halo + wc]
    return blocks.transpose(0, 1, 4, 2, 5, 3).reshape(
        nb, nh * th, nw * wc, chans)


def convlstm_pallas(x, k_merged, bias, activation="leaky_relu",
                    recurrent_activation="sigmoid", interpret=None,
                    stack_taps=True):
    """Fused forward of the merged-kernel ConvLSTM.

    x: (nb, ne, H, W, Cin); k_merged: (3, 3, Cin+F, 4F); bias: (4F,)
    → hidden (nb, H, W, F) — identical math to the unrolled XLA path in
    models/convlstm.py (up to f32 accumulation order)."""
    nb, ne, h, w, cin = x.shape
    kh_, kw_, c, f4 = k_merged.shape
    assert (kh_, kw_) == (3, 3), "fused ConvLSTM supports 3×3 kernels"
    f = f4 // 4
    assert c == cin + f, (c, cin, f)
    dtype = x.dtype
    blk = _block_shape(h, w, ne, f, cin, dtype.itemsize)
    if blk is None:
        raise ValueError(
            f"convlstm_pallas: no VMEM-viable block at H={h} W={w} "
            f"ne={ne} F={f} Cin={cin} {dtype} — emitting the kernel "
            "anyway hangs the TPU compile helper; use the XLA "
            "recurrence (models/convlstm.py gates on "
            "ops.pallas_convlstm.fused_viable)")
    th, wc = blk
    halo = ne
    r = th + 2 * halo
    wp = wc + 2 * halo
    m = r * wp
    nh = h // th
    nw = w // wc

    windows, k_mat, b2 = _prep(x, k_merged, bias, th, wc, stack_taps)

    kern = functools.partial(_fwd_kernel, activation, recurrent_activation,
                             ne, th, wc, halo, h, w, f, stack_taps)
    interp = (not _on_tpu()) if interpret is None else interpret
    k_shape = k_mat.shape

    def impl(windows_, k_mat_, b2_):
        nb_ = windows_.shape[0]  # local (per-shard) batch under DP
        return (pl.pallas_call(
            kern,
            grid=(nb_, nh, nw),
            in_specs=[
                pl.BlockSpec((1, 1, 1, ne, cin, m),
                             lambda b, i, j: (b, i, j, 0, 0, 0)),
                pl.BlockSpec(k_shape, lambda b, i, j: (0, 0, 0)),
                pl.BlockSpec((4 * f, 1), lambda b, i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, 1, f, m),
                                   lambda b, i, j: (b, i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nb_, nh, nw, f, m), dtype),
            scratch_shapes=[pltpu.VMEM((3 * c, m), dtype)],
            interpret=interp,
        )(windows_, k_mat_, b2_),)

    # batch-elementwise → DP-shardable (see partition.py)
    wrapped = dp_partitioned(impl, (True, False, False), (True,))
    (out,) = wrapped(windows, k_mat, b2)

    return _crop(out, nb, nh, nw, th, wc, halo, f)


# --------------------------------------------------------------------------
# reference recurrence (non-TPU path + parity oracle + bwd recompute)
# --------------------------------------------------------------------------


def _jnp_reference(x, k_merged, bias, activation, recurrent_activation):
    """The unrolled XLA recurrence (same math as models/convlstm.py),
    returning (hidden, per-echo (hidden ‖ cell) stack)."""
    act = _act_fn(activation)
    rec_act = _act_fn(recurrent_activation)
    nb, ne, h, w, cin = x.shape
    f = k_merged.shape[-1] // 4
    dtype = x.dtype
    hidden = jnp.zeros((nb, h, w, f), dtype)
    cell = jnp.zeros((nb, h, w, f), dtype)
    dn = lax.conv_dimension_numbers(
        (nb, h, w, cin + f), k_merged.shape, ("NHWC", "HWIO", "NHWC"))
    states = []
    for e in range(ne):
        inp = jnp.concatenate([x[:, e], hidden], axis=-1)
        gates = lax.conv_general_dilated(
            inp, k_merged.astype(dtype), (1, 1), "SAME",
            dimension_numbers=dn) + bias.astype(dtype)
        i, fg, gg, o = jnp.split(gates, 4, axis=-1)
        cell = rec_act(fg) * cell + rec_act(i) * act(gg)
        hidden = rec_act(o) * act(cell)
        states.append(jnp.concatenate([hidden, cell], axis=-1))
    return hidden, jnp.stack(states, axis=1)


# --------------------------------------------------------------------------
# custom-vjp wrapper: fused forward + recompute-backward
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def convlstm_fused(x, k_merged, bias, activation="leaky_relu",
                   recurrent_activation="sigmoid"):
    """ConvLSTM forward (fused Pallas on TPU, XLA elsewhere) whose
    backward rematerializes the per-echo states (one XLA forward) and
    runs a hand-written reverse sweep — nothing but (x, k, bias) is
    saved across the loss computation."""
    if _use_fused():
        return convlstm_pallas(x, k_merged, bias, activation,
                               recurrent_activation)
    return _jnp_reference(x, k_merged, bias, activation,
                          recurrent_activation)[0]


def _fused_fwd(x, k_merged, bias, activation, recurrent_activation):
    out = convlstm_fused(x, k_merged, bias, activation,
                         recurrent_activation)
    return out, (x, k_merged, bias)


def _echo_step(x_e, h_prev, c_prev, k_merged, bias, dn, act, rec_act):
    """One echo of the recurrence from explicit previous state."""
    inp = jnp.concatenate([x_e, h_prev], axis=-1)
    gates = lax.conv_general_dilated(
        inp, k_merged, (1, 1), "SAME", dimension_numbers=dn) + bias
    i, fg, gg, o = jnp.split(gates, 4, axis=-1)
    cell = rec_act(fg) * c_prev + rec_act(i) * act(gg)
    hidden = rec_act(o) * act(cell)
    return hidden, cell


def _fused_bwd(activation, recurrent_activation, res, g):
    """On TPU: the fused Pallas backward (in-VMEM state recompute +
    reverse sweep, below). Elsewhere: rematerialize the state chain
    (one XLA forward), then sweep reverse-time — at echo e,
    re-linearize the single echo step around the recomputed state
    (h_{e-1}, c_{e-1}) and pull (dh_e, dc_e) back to (dx_e, dh_{e-1},
    dc_{e-1}, dk, db). Either way nothing but (x, k, bias) is held
    across the loss computation — autodiff would hold 4F
    pre-activations + pointwise products per echo."""
    x, k_merged, bias = res
    if _use_fused():
        return convlstm_bwd_pallas(x, k_merged, bias, g, activation,
                                   recurrent_activation)
    act = _act_fn(activation)
    rec_act = _act_fn(recurrent_activation)
    _, states = _jnp_reference(x, k_merged, bias, activation,
                               recurrent_activation)
    nb, ne, h, w, cin = x.shape
    f = k_merged.shape[-1] // 4
    dtype = x.dtype
    dn = lax.conv_dimension_numbers(
        (nb, h, w, cin + f), k_merged.shape, ("NHWC", "HWIO", "NHWC"))
    kd = k_merged.astype(dtype)
    bd = bias.astype(dtype)

    zeros = jnp.zeros((nb, h, w, f), dtype)
    dh = g
    dc = jnp.zeros_like(g)
    dx = []
    dk = jnp.zeros_like(k_merged)
    db = jnp.zeros_like(bias)
    for e in range(ne - 1, -1, -1):
        h_prev = states[:, e - 1, ..., :f] if e > 0 else zeros
        c_prev = states[:, e - 1, ..., f:] if e > 0 else zeros
        _, vjp = jax.vjp(
            lambda xe, hp, cp, k, b: _echo_step(xe, hp, cp, k, b, dn,
                                                act, rec_act),
            x[:, e], h_prev, c_prev, kd, bd)
        dx_e, dh, dc_new, dk_e, db_e = vjp((dh, dc))
        dc = dc_new
        dx.append(dx_e)
        dk = dk + dk_e.astype(dk.dtype)
        db = db + db_e.astype(db.dtype)
    dx = jnp.stack(dx[::-1], axis=1)
    return dx, dk, db


convlstm_fused.defvjp(_fused_fwd, _fused_bwd)


# --------------------------------------------------------------------------
# fused backward kernel: in-VMEM state recompute + reverse sweep
# --------------------------------------------------------------------------


def _block_shape_bwd(h: int, w: int, ne: int, f: int, cin: int,
                     itemsize: int):
    """Block search for the backward kernel (larger working set: the
    per-echo hidden/cell state stacks live in VMEM scratch)."""
    budget = 9 * 2 ** 20
    c = cin + f
    cp = -(-( -(-cin // 8) * 8 + f) // 8) * 8  # padded Cp slot (dinp)
    per_m = (2 * ne * f * itemsize           # h/c state stacks (scratch)
             + 4 * f * 4                     # gates (f32)
             + 2 * 4 * f * 4                 # dgates f32 + vjp temps
             + 4 * f * itemsize              # dgates cast for matmuls
             + 3 * c * itemsize              # dy-row stack scratch
             + 2 * c * itemsize              # inp + rolled copy
             + 3 * cp * 4                    # dinp dy-row product (f32)
             + cp * 4                        # ysc tap scratch (f32)
             + c * 4                         # dinp accumulator (f32)
             + 3 * f * 4                     # dh, dc, dc_tot (f32)
             + 2 * f * itemsize              # g input (dbl-buffered)
             + 2 * ne * cin * itemsize       # x window (dbl-buffered)
             + 2 * ne * cin * itemsize)      # dx output (dbl-buffered)
    best = None
    for wc in (128, 192, 96, 256, 64, w):
        if wc > w or w % wc:
            continue
        for th in (64, 48, 32, 24, 16, 12, 8, 6, 4, 3, 2, 1):
            if h % th:
                continue
            m = (th + 2 * (ne + 1)) * (wc + 2 * (ne + 1))
            if m * per_m > budget:
                continue
            eff = (th * wc) / m
            if best is None or eff > best[0]:
                best = (eff, th, wc)
            break
    if best is None:
        return None  # no block fits the VMEM budget (callers fall back)
    return best[1], best[2]


def _bwd_kernel(act_name, rec_act_name, ne, th, wc, halo, h_true, w_true,
                f, cin, x_ref, g_ref, k_ref, ktall_ref, b_ref,
                dx_ref, dk_ref, db_ref, sth_ref, stc_ref, stack_ref,
                dxs_ref, ysc_ref):
    """One grid cell: recompute the recurrence with states in VMEM, then
    reverse-sweep it. halo = ne+1 (one ring more than the forward: the
    reverse taint front and the legit gradient front both move 1 px per
    echo — the extra ring keeps legit dx strictly inside ring ≥ 1).

    x_ref:  (1, 1, 1, ne, Cin, M) input window (zero-padded halo)
    g_ref:  (1, 1, 1, F, M) cotangent of the final hidden — the halo
            carries NEIGHBOR blocks' cotangent and is masked to the
            owned region (gradients are additive over blocks: each block
            back-propagates exactly the chains rooted at its own g)
    k_ref:  (3, 4F, 3C) dy-row stacked kernel (as the forward)
    ktall_ref: (3, 3Cp, 4F) transposed-conv kernel for the dinp stage,
            dx-tap-stacked per dy row: one (3Cp, 4F)×(4F, m) matmul per
            dy (~94 % MXU M-fill) replaces the 18 per-tap dots/echo
            that ran at M=Cin and M=F fill. Within each Cp slot the x
            rows sit at offset 0 and the hidden rows at the
            granule-aligned offset hoff=ceil8(Cin), so the dx/dh split
            slices only at aligned offsets (an offset-Cin value slice
            crashes Mosaic in combination with the reverse recurrence)
    b_ref:  (4F, 1)
    dx_ref: (1, 1, 1, ne·Cin, M) per-window dx (echo-major rows; the
            host reshapes) — the host overlap-adds (windows overlap by
            2·halo, and a block legitimately owns gradient
            contributions into its halo). Rows accumulate in dxs_ref
            and store once: per-echo 2-row stores into a 6-D output
            block crash Mosaic
    dk_ref: (1, 3, 4F, 3C) f32 — PER-BATCH slot, accumulated over the
            spatial grid only; the host sums over nb in XLA. Keeping the
            kernel batch-elementwise lets dp_partitioned shard it under
            DP (the nb-sum outside becomes the gradient all-reduce)
    db_ref: (1, 4F, 1) f32, same per-batch accumulation
    sth_ref/stc_ref: (ne, F, M) per-echo state scratch
    stack_ref: (3C, M) dy-row stack scratch
    dxs_ref: (ne·Cin, M) dx accumulator scratch
    """
    act = _act_fn(act_name)
    rec_act = _act_fn(rec_act_name)
    b_blk = pl.program_id(0)
    i_blk = pl.program_id(1)
    j_blk = pl.program_id(2)
    dtype = x_ref.dtype
    r = th + 2 * halo
    wp = wc + 2 * halo
    m = r * wp
    c = cin + f

    del b_blk  # dk/db blocks are per-batch; init at each batch's first cell

    @pl.when((i_blk == 0) & (j_blk == 0))
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    pos = lax.broadcasted_iota(jnp.int32, (1, m), 1)
    row = pos // wp
    col = pos - row * wp
    grow = row + i_blk * th
    gcol = col + j_blk * wc
    img_mask = ((grow >= halo) & (grow < h_true + halo)
                & (gcol >= halo) & (gcol < w_true + halo)
                ).astype(jnp.float32)
    owned = ((row >= halo) & (row < halo + th)
             & (col >= halo) & (col < halo + wc)).astype(jnp.float32)
    depth = jnp.minimum(jnp.minimum(row, r - 1 - row),
                        jnp.minimum(col, wp - 1 - col))

    bias = b_ref[...].astype(jnp.float32)

    def gates_at(e, hidden):
        """gates_e from (x_e, hidden) via the dy-row stacked matmuls;
        leaves stack_ref holding the LAST dy row (rebuilt in the dk
        pass)."""
        x_e = x_ref[0, 0, 0, e]
        inp = jnp.concatenate([x_e, hidden], axis=0)
        gates = jnp.broadcast_to(bias, (4 * f, m))
        for i_dy, dy in enumerate((-1, 0, 1)):
            rowv = _roll(inp, -dy * wp)
            stack_ref[0:c] = _roll(rowv, 1)
            stack_ref[c:2 * c] = rowv
            stack_ref[2 * c:] = _roll(rowv, -1)
            gates = gates + jnp.dot(k_ref[i_dy], stack_ref[...],
                                    preferred_element_type=jnp.float32)
        return gates, inp

    def cell_math(gates, c_prev):
        gi = rec_act(gates[:f])
        gf = rec_act(gates[f:2 * f])
        gg = act(gates[2 * f:3 * f])
        go = rec_act(gates[3 * f:])
        cellf = (gf * c_prev + gi * gg) * img_mask
        hidden = go * act(cellf) * img_mask
        return hidden, cellf

    # ---- forward recompute, states resident in VMEM scratch ----------
    hidden = jnp.zeros((f, m), dtype)
    cell32 = jnp.zeros((f, m), jnp.float32)
    for e in range(ne):
        gates, _ = gates_at(e, hidden)
        hidden32, cell32 = cell_math(gates, cell32)
        hidden = hidden32.astype(dtype)
        sth_ref[e] = hidden
        stc_ref[e] = cell32.astype(dtype)

    # ---- reverse sweep ------------------------------------------------
    dh = g_ref[0, 0, 0].astype(jnp.float32) * owned
    dc = jnp.zeros((f, m), jnp.float32)
    for e in range(ne - 1, -1, -1):
        s = ne - e  # reverse step, 1-indexed
        h_prev = sth_ref[e - 1] if e > 0 else jnp.zeros((f, m), dtype)
        c_prev = (stc_ref[e - 1].astype(jnp.float32) if e > 0
                  else jnp.zeros((f, m), jnp.float32))
        gates, inp = gates_at(e, h_prev)
        # exact local derivatives for whatever activation pair is in use
        _, vjp = jax.vjp(cell_math, gates, c_prev)
        dgates, dc = vjp((dh, dc))
        # legit gradient front after s steps: depth ≥ halo − s; beyond
        # it only roll-wrap taint lives — zero it before it reaches
        # dk/db/dx or the next echo
        front = (depth >= (halo - s)).astype(jnp.float32)
        dgates = dgates * front
        db_ref[0] += jnp.sum(dgates, axis=1, keepdims=True)
        dgates_mm = dgates.astype(dtype)
        # dk: rebuild the dy-row stacks (same contents as gates_at left
        # them for dy=+1 only) and contract over the flat positions
        for i_dy, dy in enumerate((-1, 0, 1)):
            rowv = _roll(inp, -dy * wp)
            stack_ref[0:c] = _roll(rowv, 1)
            stack_ref[c:2 * c] = rowv
            stack_ref[2 * c:] = _roll(rowv, -1)
            dk_ref[0, i_dy] += lax.dot_general(
                dgates_mm, stack_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        # transposed conv back to x and hidden: one dx-tap-stacked
        # (3Cp, 4F)×(4F, m) matmul per dy row (ktall_ref layout above),
        # then the roll is hoisted onto the OUTPUT — roll(kT@dg, s) =
        # kT@roll(dg, s) — with each rolled tap slice STORED to VMEM
        # scratch first: stores materialize the lazy lane offset, so
        # the dxe/dhn accumulators only ever add materialized values
        # (accumulating rolled products directly crashes Mosaic;
        # rolling the dgates operand instead — the previous form —
        # forced 18 per-tap dots/echo at M=Cin / M=F MXU fill).
        hoff = -(-cin // 8) * 8
        cp = ysc_ref.shape[0]
        dxe = jnp.zeros((cin, m), jnp.float32)
        dhn = jnp.zeros((f, m), jnp.float32)
        for i_dy, dy in enumerate((-1, 0, 1)):
            y = jnp.dot(ktall_ref[i_dy], dgates_mm,
                        preferred_element_type=jnp.float32)  # (3Cp, m)
            for i_dx, dx in enumerate((-1, 0, 1)):
                ysc_ref[...] = _roll(y[i_dx * cp:(i_dx + 1) * cp],
                                     dy * wp + dx)
                yv = ysc_ref[...]
                dxe = dxe + yv[0:cin]
                dhn = dhn + yv[hoff:hoff + f]
        dx_mask = (depth >= jnp.maximum(halo - s - 1, 1)).astype(
            jnp.float32)
        dxs_ref[e * cin:(e + 1) * cin] = (dxe * dx_mask).astype(dtype)
        dh = dhn

    dx_ref[0, 0, 0] = dxs_ref[...]

    return


def convlstm_bwd_pallas(x, k_merged, bias, g, activation="leaky_relu",
                        recurrent_activation="sigmoid", interpret=None):
    """Fused backward: (x, k, bias, dL/dhidden) → (dx, dk, db).

    Per spatial block: recompute the recurrence with per-echo states in
    VMEM, then sweep reverse-time — gates recomputed per echo from the
    resident states, exact pointwise derivatives via an in-kernel
    jax.vjp of the cell, and the transposed conv back to (dx, dh) as ONE
    dx-tap-stacked (3Cp, 4F)×(4F, m) matmul per dy row (~94 % MXU
    M-fill; see ktall_ref in _bwd_kernel), with the tap roll hoisted
    onto the matmul OUTPUT and materialized through VMEM scratch. HBM
    traffic: x + g in once, dx out once; dk/db accumulate in VMEM
    per-batch across the (sequential) spatial grid, summed over nb in
    XLA outside (the DP all-reduce under sharding).

    Validated on TPU v5e at 384²·b8·F32 (round 5, docs/DESIGN.md): bwd
    alone 215.6 ms f32 / 86.1 ms bf16 vs 244.1 / 143.2 for the XLA
    rematerialized reverse sweep (the custom_vjp's like-for-like
    memory-lean alternative) — 1.13× / 1.66×. Plain full-residual
    autodiff is faster at f32 (≈156 ms bwd) but holds every per-echo
    gate tensor across the loss — the HBM blow-up this custom_vjp
    exists to avoid."""
    nb, ne, h, w, cin = x.shape
    f = k_merged.shape[-1] // 4
    c = cin + f
    dtype = x.dtype
    blk = _block_shape_bwd(h, w, ne, f, cin, dtype.itemsize)
    if blk is None:
        raise ValueError(
            f"convlstm_bwd_pallas: no VMEM-viable block at H={h} W={w} "
            f"ne={ne} F={f} Cin={cin} {dtype} (the state stacks + "
            "dgates temps exceed the budget at every (th, wc) — e.g. "
            "F=72 at 384²) — emitting the kernel anyway hangs the TPU "
            "compile helper; use the XLA recurrence")
    th, wc = blk
    halo = ne + 1
    r = th + 2 * halo
    wp = wc + 2 * halo
    m = r * wp
    nh = h // th
    nw = w // wc

    xp = jnp.pad(x, ((0, 0), (0, 0), (halo, halo), (halo, halo), (0, 0)))
    xw = jnp.stack(
        [jnp.stack([xp[:, :, i * th:i * th + r, j * wc:j * wc + wp]
                    for j in range(nw)], axis=1)
         for i in range(nh)], axis=1)
    xw = xw.transpose(0, 1, 2, 3, 6, 4, 5).reshape(nb, nh, nw, ne, cin, m)
    gp = jnp.pad(g, ((0, 0), (halo, halo), (halo, halo), (0, 0)))
    gw = jnp.stack(
        [jnp.stack([gp[:, i * th:i * th + r, j * wc:j * wc + wp]
                    for j in range(nw)], axis=1)
         for i in range(nh)], axis=1)
    gw = gw.transpose(0, 1, 2, 5, 3, 4).reshape(nb, nh, nw, f, m)

    k_mat = jnp.stack(
        [jnp.concatenate([k_merged[dy + 1, 0].T, k_merged[dy + 1, 1].T,
                          k_merged[dy + 1, 2].T], axis=1)
         for dy in (-1, 0, 1)], axis=0).astype(dtype)       # (3, 4F, 3C)
    # Transposed-conv kernel for the dinp stage, dx-tap-stacked per dy
    # row so the whole row runs as ONE (3·Cp, 4F)×(4F, m) matmul at
    # ~94 % MXU M-fill (the per-tap form ran 18 dots/echo at M=Cin=2
    # and M=F fill). Each Cp slot keeps the x rows at offset 0 and the
    # hidden rows at the f32-sublane-granule-aligned offset `hoff`, so
    # the kernel's dx/dh split never slices a value at offset Cin
    # (which crashes Mosaic — see the dinp notes in _bwd_kernel).
    hoff = -(-cin // 8) * 8
    cp = -(-(hoff + f) // 8) * 8
    pad_rows = jnp.zeros((hoff - cin, 4 * f), k_merged.dtype)
    tail_rows = jnp.zeros((cp - hoff - f, 4 * f), k_merged.dtype)
    ktall_mat = jnp.stack(
        [jnp.concatenate(
            [jnp.concatenate([k_merged[dy + 1, dx + 1, :cin], pad_rows,
                              k_merged[dy + 1, dx + 1, cin:], tail_rows],
                             axis=0)
             for dx in (-1, 0, 1)], axis=0)
         for dy in (-1, 0, 1)], axis=0).astype(dtype)       # (3, 3Cp, 4F)
    b2 = bias.reshape(4 * f, 1).astype(dtype)

    kern = functools.partial(_bwd_kernel, activation, recurrent_activation,
                             ne, th, wc, halo, h, w, f, cin)
    interp = (not _on_tpu()) if interpret is None else interpret

    def impl(xw_, gw_, k_mat_, ktall_mat_, b2_):
        nb_ = xw_.shape[0]  # local (per-shard) batch under DP
        return pl.pallas_call(
            kern,
            grid=(nb_, nh, nw),
            in_specs=[
                pl.BlockSpec((1, 1, 1, ne, cin, m),
                             lambda b, i, j: (b, i, j, 0, 0, 0)),
                pl.BlockSpec((1, 1, 1, f, m),
                             lambda b, i, j: (b, i, j, 0, 0)),
                pl.BlockSpec((3, 4 * f, 3 * c), lambda b, i, j: (0, 0, 0)),
                pl.BlockSpec((3, 3 * cp, 4 * f),
                             lambda b, i, j: (0, 0, 0)),
                pl.BlockSpec((4 * f, 1), lambda b, i, j: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, 1, ne * cin, m),
                             lambda b, i, j: (b, i, j, 0, 0)),
                pl.BlockSpec((1, 3, 4 * f, 3 * c),
                             lambda b, i, j: (b, 0, 0, 0)),
                pl.BlockSpec((1, 4 * f, 1), lambda b, i, j: (b, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nb_, nh, nw, ne * cin, m), dtype),
                jax.ShapeDtypeStruct((nb_, 3, 4 * f, 3 * c), jnp.float32),
                jax.ShapeDtypeStruct((nb_, 4 * f, 1), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((ne, f, m), dtype),
                            pltpu.VMEM((ne, f, m), dtype),
                            pltpu.VMEM((3 * c, m), dtype),
                            pltpu.VMEM((ne * cin, m), dtype),
                            pltpu.VMEM((cp, m), jnp.float32)],
            interpret=interp,
        )(xw_, gw_, k_mat_, ktall_mat_, b2_)

    # Batch-elementwise (dk/db per-batch slots) → DP-shardable; the
    # nb-sums below run in XLA outside the kernel, so under DP they
    # lower to the standard gradient all-reduce.
    wrapped = dp_partitioned(impl, (True, True, False, False, False),
                             (True, True, True))
    dxw, dk_b, db_b = wrapped(xw, gw, k_mat, ktall_mat, b2)
    dk = jnp.sum(dk_b, axis=0)
    db = jnp.sum(db_b, axis=0)

    # overlap-add the dx windows (blocks legitimately write gradient
    # into their halos; windows overlap by 2·halo). Grouped: windows
    # whose grid indices are ≡ (a, b) mod (sa, sb) are pairwise disjoint
    # once sa·th ≥ r, so each group lands as ONE strided add — a
    # handful of adds instead of nh·nw scatter ops.
    dxw = dxw.reshape(nb, nh, nw, ne, cin, r, wp)  # echo-major rows
    sa = -(-r // th)   # ceil: smallest stride making same-group rows disjoint
    sb = -(-wp // wc)
    hp = (nh + sa) * th + 2 * halo
    wpad = (nw + sb) * wc + 2 * halo
    canvas = jnp.zeros((nb, ne, hp, wpad, cin), jnp.float32)
    for a in range(sa):
        for b in range(sb):
            sub = dxw[:, a::sa, b::sb].astype(jnp.float32)
            ni, nj = sub.shape[1], sub.shape[2]
            if ni == 0 or nj == 0:
                continue
            # pad each window to the (disjoint) group pitch and fuse the
            # block grid into plain rows/cols
            sub = jnp.pad(sub, ((0, 0), (0, 0), (0, 0), (0, 0), (0, 0),
                                (0, sa * th - r), (0, sb * wc - wp)))
            sub = sub.transpose(0, 3, 1, 5, 2, 6, 4).reshape(
                nb, ne, ni * sa * th, nj * sb * wc, cin)
            canvas = canvas.at[:, :, a * th:a * th + ni * sa * th,
                               b * wc:b * wc + nj * sb * wc].add(sub)
    dx = canvas[:, :, halo:halo + h, halo:halo + w].astype(dtype)

    # (3, 4F, 3C) dy-row stacks → (3, 3, C, 4F) merged-kernel gradient
    dk_rows = dk.reshape(3, 4 * f, 3, c).transpose(0, 2, 3, 1)
    dk_full = dk_rows.astype(k_merged.dtype)
    db_full = db.reshape(4 * f).astype(bias.dtype)
    return dx, dk_full, db_full

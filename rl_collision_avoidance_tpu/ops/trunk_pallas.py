"""Fused Pallas TPU kernels for the twin CNN trunks (forward + backward).

The PPO update phase is the training bottleneck: one fwd+bwd of the
2.17M-param twin-trunk CNN (reference ``model/net.py:16-80``) at minibatch
131,072 measures fwd ~11 ms / bwd ~113 ms in f32 (docs/PERF.md).  The
backward is HBM-bound, not FLOP-bound: XLA saves every conv activation for
the backward pass (conv1 out alone is 4.3 GB/trunk/minibatch), re-reads
them, and lowers the tiny-channel conv filter-gradient kernels far below
matmul rates.

These kernels collapse that traffic.  Each grid program processes a tile of
samples entirely in VMEM:

* **forward** — conv1 (k5 s2 p1) -> relu -> conv2 (k3 s2 p1) -> relu ->
  flatten -> fc1 -> relu, per trunk, writing only the (tile, 256) trunk
  features back to HBM.  No intermediate activation ever touches HBM.
* **backward** — recomputes the tile's activations in VMEM (FLOPs are
  cheap; the convs are ~1/3 of the fc1 matmul) and accumulates the six
  parameter gradients across tiles directly in the VMEM-resident output
  blocks.  ``dX`` is NOT computed: the lidar observation is data, never
  differentiated through (the custom_vjp returns a zeros cotangent that
  XLA dead-code-eliminates).

Both convs are expressed as matmuls over statically-sliced even/odd
decompositions of the (padded) spatial axis — stride-2 sampling becomes a
``reshape(..., L/2, 2, C)`` — so the MXU sees plain dots and Mosaic never
meets a strided memory access.  The backward's transposed conv (dconv1_out)
is the same decomposition run in reverse: per-tap matmuls against W2^T,
then an interleave.

The grid is (2 trunks, n_tiles) trunk-major: one trunk's weights stay
VMEM-resident across all its tiles, and the gradient output blocks (indexed
by trunk only) accumulate in place across the sequential tile iterations.

Matmul precision follows JAX's TPU default (bf16 multiplies, f32
accumulation) — the same precision the XLA conv path runs at on TPU, so
"f32 parity" is preserved; ``precision="float32"`` keeps exact f32 for the
CPU equivalence tests.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class TrunkConfig(NamedTuple):
    """Static (hashable) kernel configuration for the custom_vjp."""
    tile_fwd: int = 64
    tile_bwd: int = 32
    precision: str = "default"     # "default" = bf16 mult / f32 accum
    out_dtype: str = "float32"     # dtype of the (2, B, 256) trunk features
    interpret: bool = False


def _mm(a, b, precision, dims=None):
    """Matmul (or dot_general) at the configured MXU precision."""
    if precision == "default":
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    else:
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
    if dims is None:
        dims = (((a.ndim - 1,), (0,)), ((), ()))
    return jax.lax.dot_general(a, b, dimension_numbers=dims,
                               preferred_element_type=jnp.float32)


def _conv_dims(nb: int):
    """Spatial sizes after conv1 (k5 s2 p1) and conv2 (k3 s2 p1).

    The even/odd reshape decomposition below needs nb % 4 == 0 (so l1 is
    odd and the stride-2 windows align); every world satisfies it (512
    production beams, 64 for the mini test world)."""
    assert nb % 4 == 0, f"beam count {nb} not divisible by 4"
    l1 = nb // 2 - 1
    l2 = (l1 + 1) // 2
    return l1, l2


def _trunk_tile_forward(x, w1, b1, w2, b2, wf, bf, precision):
    """One tile through one trunk; x (TB, F, NB).  Returns the VMEM
    intermediates the backward reuses: (patches, conv1, c2in, conv2, flat,
    out)."""
    tb, f, nb = x.shape
    l1, l2 = _conv_dims(nb)
    xt = jnp.transpose(x.astype(jnp.float32), (0, 2, 1))   # (TB, NB, F)
    xp = jnp.pad(xt, ((0, 0), (1, 1), (0, 0)))             # (TB, NB+2, F)
    # Stride-2 window sampling as even/odd reshapes (no strided slices):
    # q[l, d] = xp[2l + d], r[l, d] = xp[2l + 2 + d].
    q = xp[:, :nb, :].reshape(tb, nb // 2, 2, f)
    r = xp[:, 2:nb + 2, :].reshape(tb, nb // 2, 2, f)
    patches = jnp.concatenate([
        q[:, :l1, 0], q[:, :l1, 1],                        # xp[2l], xp[2l+1]
        r[:, :l1, 0], r[:, :l1, 1],                        # xp[2l+2], [2l+3]
        r[:, 1:l1 + 1, 0],                                 # xp[2l+4]
    ], axis=-1)                                            # (TB, L1, 5F)
    y1 = _mm(patches.reshape(tb * l1, 5 * f),
             w1.reshape(5 * f, 32), precision) + b1
    conv1 = jnp.maximum(y1, 0.0).reshape(tb, l1, 32)

    yp = jnp.pad(conv1, ((0, 0), (1, 1), (0, 0)))          # (TB, L1+2, 32)
    q2 = yp[:, :l1 + 1, :].reshape(tb, l2, 2, 32)
    e2 = q2[:, :, 0]                                       # yp[2l]
    o2 = q2[:, :, 1]                                       # yp[2l+1]
    e2s = jnp.concatenate([e2[:, 1:], jnp.zeros_like(e2[:, :1])],
                          axis=1)                          # yp[2l+2]
    c2in = (e2, o2, e2s)
    y2 = (_mm(e2.reshape(-1, 32), w2[0], precision)
          + _mm(o2.reshape(-1, 32), w2[1], precision)
          + _mm(e2s.reshape(-1, 32), w2[2], precision)) + b2
    conv2 = jnp.maximum(y2, 0.0).reshape(tb, l2, 32)

    flat = conv2.reshape(tb, l2 * 32)
    out = jnp.maximum(_mm(flat, wf, precision) + bf, 0.0)  # (TB, 256)
    return patches, conv1, c2in, conv2, flat, out


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, wf_ref, bf_ref,
                out_ref, *, precision, out_dtype):
    *_, out = _trunk_tile_forward(
        x_ref[...], w1_ref[0], b1_ref[0, 0], w2_ref[0], b2_ref[0, 0],
        wf_ref[0], bf_ref[0, 0], precision)
    out_ref[0] = out.astype(out_dtype)


def _bwd_kernel(x_ref, g_ref, w1_ref, b1_ref, w2_ref, b2_ref, wf_ref, bf_ref,
                dw1_ref, db1_ref, dw2_ref, db2_ref, dwf_ref, dbf_ref, *,
                precision):
    tb, _, nb = x_ref.shape
    l1, l2 = _conv_dims(nb)
    w2 = w2_ref[0]
    patches, conv1, (e2, o2, e2s), conv2, flat, out = _trunk_tile_forward(
        x_ref[...], w1_ref[0], b1_ref[0, 0], w2, b2_ref[0, 0], wf_ref[0],
        bf_ref[0, 0], precision)

    rows = (((0,), (0,)), ((), ()))          # contract the sample axis
    cols = (((1,), (1,)), ((), ()))          # g @ W^T without materializing

    g1 = g_ref[0].astype(jnp.float32) * (out > 0.0)        # (TB, 256)
    dwf = _mm(flat, g1, precision, dims=rows)              # (4096, 256)
    dbf = jnp.sum(g1, axis=0)

    dflat = _mm(g1, wf_ref[0], precision, dims=cols)       # (TB, 32*L2)
    g2 = dflat.reshape(tb, l2, 32) * (conv2 > 0.0)
    g2f = g2.reshape(-1, 32)
    dw2 = jnp.stack([_mm(c.reshape(-1, 32), g2f, precision, dims=rows)
                     for c in (e2, o2, e2s)])              # (3, 32, 32)
    db2 = jnp.sum(g2, axis=(0, 1))

    # Transposed conv2: scatter the three tap contributions back onto the
    # conv1 grid.  With t_k = g2 @ W2[k]^T, position 2m of conv1 receives
    # t_1[m]; position 2m+1 receives t_0[m+1] + t_2[m] (the left/right
    # paddings fall off the ends).  Interleave even/odd and trim.
    t0 = _mm(g2f, w2[0], precision, dims=cols).reshape(tb, l2, 32)
    t1 = _mm(g2f, w2[1], precision, dims=cols).reshape(tb, l2, 32)
    t2 = _mm(g2f, w2[2], precision, dims=cols).reshape(tb, l2, 32)
    d_odd = jnp.concatenate([t0[:, 1:], jnp.zeros_like(t0[:, :1])],
                            axis=1) + t2
    dconv1 = jnp.stack([t1, d_odd], axis=2).reshape(tb, 2 * l2, 32)[:, :l1]
    g3 = dconv1 * (conv1 > 0.0)                            # (TB, L1, 32)

    kf = patches.shape[-1]
    dw1 = _mm(patches.reshape(-1, kf), g3.reshape(-1, 32), precision,
              dims=rows)                                   # (5F, 32)
    db1 = jnp.sum(g3, axis=(0, 1))

    i = pl.program_id(1)
    contribs = ((dw1_ref, dw1.reshape(dw1_ref.shape[1:])),
                (db1_ref, db1[None]), (dw2_ref, dw2), (db2_ref, db2[None]),
                (dwf_ref, dwf), (dbf_ref, dbf[None]))

    @pl.when(i == 0)
    def _():
        for ref, val in contribs:
            ref[0] = val

    @pl.when(i > 0)
    def _():
        for ref, val in contribs:
            ref[0] += val


def _pad_rows(x, tile, axis=0):
    """Zero-pad ``axis`` of ``x`` up to a multiple of ``tile``."""
    b = x.shape[axis]
    pad = (-b) % tile
    if pad == 0:
        return x, b
    width = [(0, 0)] * x.ndim
    width[axis] = (0, pad)
    return jnp.pad(x, width), b


def _weight_specs(f, flatdim):
    # Biases travel as (2, 1, X): Mosaic requires the block's second-to-last
    # dim be 8-divisible or equal to the array's, which a (1, X) block of a
    # (2, X) array violates — the singleton axis sidesteps it.
    full = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda t, i: (t,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    return [full(5, f, 32), full(1, 32), full(3, 32, 32), full(1, 32),
            full(flatdim, 256), full(1, 256)]


_WEIGHT_KEYS = ("w1", "b1", "w2", "b2", "wf", "bf")
_BIAS_KEYS = ("b1", "b2", "bf")


def _weight_args(stacked):
    return [stacked[k][:, None] if k in _BIAS_KEYS else stacked[k]
            for k in _WEIGHT_KEYS]


def _fwd_call(stacked, x, cfg: TrunkConfig):
    xp, b = _pad_rows(x, cfg.tile_fwd)
    bp, f, nb = xp.shape
    _, l2 = _conv_dims(nb)
    assert stacked["wf"].shape[1] == 32 * l2, \
        "fc1 weight does not match the conv output for this beam count"
    nt = bp // cfg.tile_fwd
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, precision=cfg.precision,
                          out_dtype=jnp.dtype(cfg.out_dtype)),
        grid=(2, nt),
        in_specs=[pl.BlockSpec((cfg.tile_fwd, f, nb), lambda t, i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + _weight_specs(f, 32 * l2),
        out_specs=pl.BlockSpec((1, cfg.tile_fwd, 256),
                               lambda t, i: (t, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, bp, 256), jnp.dtype(cfg.out_dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=cfg.interpret,
    )(xp, *_weight_args(stacked))
    return out[:, :b]


def _bwd_call(stacked, x, g, cfg: TrunkConfig):
    xp, b = _pad_rows(x, cfg.tile_bwd)
    bp, f, nb = xp.shape
    _, l2 = _conv_dims(nb)
    gp, _ = _pad_rows(g, cfg.tile_bwd, axis=1)   # pad the sample axis;
    # padded rows carry g = 0, so they contribute nothing to any dW/db
    nt = bp // cfg.tile_bwd
    grad_shapes = [jax.ShapeDtypeStruct(
        (2, 1) + stacked[k].shape[1:] if k in _BIAS_KEYS
        else (2,) + stacked[k].shape[1:], jnp.float32)
        for k in _WEIGHT_KEYS]
    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, precision=cfg.precision),
        grid=(2, nt),
        in_specs=[
            pl.BlockSpec((cfg.tile_bwd, f, nb), lambda t, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cfg.tile_bwd, 256), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM),
        ] + _weight_specs(f, 32 * l2),
        out_specs=_weight_specs(f, 32 * l2),
        out_shape=grad_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=cfg.interpret,
    )(xp, gp, *_weight_args(stacked))
    return {k: (g[:, 0] if k in _BIAS_KEYS else g)
            for k, g in zip(_WEIGHT_KEYS, grads)}


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_trunks(stacked, x, cfg: TrunkConfig):
    """Both trunk feature extractors: (B, F, 512) -> (2, B, 256).

    ``stacked``: dict of per-trunk-stacked parameters (see
    :func:`stack_trunk_params`).  Differentiable in ``stacked`` only; the
    cotangent of ``x`` is a zeros placeholder (DCE'd when unused — the
    observation is data in every PPO loss).
    """
    return _fwd_call(stacked, x, cfg)


def _fused_fwd(stacked, x, cfg):
    return _fwd_call(stacked, x, cfg), (stacked, x)


def _fused_bwd(cfg, res, g):
    stacked, x = res
    return _bwd_call(stacked, x, g, cfg), jnp.zeros_like(x)


fused_trunks.defvjp(_fused_fwd, _fused_bwd)


def stack_trunk_params(p):
    """Stack the actor/critic trunk leaves along a leading (2,) axis."""
    out = {}
    for i, trunk in enumerate(("act_trunk", "crt_trunk")):
        t = p[trunk]
        leaves = {"w1": t["Conv_0"]["kernel"], "b1": t["Conv_0"]["bias"],
                  "w2": t["Conv_1"]["kernel"], "b2": t["Conv_1"]["bias"],
                  "wf": t["Dense_0"]["kernel"], "bf": t["Dense_0"]["bias"]}
        for k, v in leaves.items():
            out.setdefault(k, [None, None])[i] = v
    return {k: jnp.stack(v) for k, v in out.items()}


def cnn_pallas_apply(params, scans, goal, speed, dtype=jnp.float32,
                     tile_fwd: int = 64, tile_bwd: int = 32,
                     precision: str = "default", interpret: bool | None = None):
    """`CNNPolicy.apply` with the twin trunks fused into Pallas kernels.

    Numerically equivalent to the flax apply at the MXU's default precision
    (bf16 multiplies / f32 accumulation — what the XLA conv path also uses
    on TPU); the dense tail (fc2 + heads) stays in XLA where its small
    activations are cheap.  Intended for the PPO update path, where the
    backward's activation traffic is the bottleneck; the acting/rollout
    path keeps the flax apply (a Pallas custom call inside the rollout scan
    would pay ~0.4 ms dispatch per env step on the axon runtime).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    p = params["params"]
    cfg = TrunkConfig(tile_fwd=tile_fwd, tile_bwd=tile_bwd,
                      precision=precision,
                      out_dtype=jnp.dtype(dtype).name, interpret=interpret)
    feats = fused_trunks(stack_trunk_params(p), scans, cfg)  # (2, B, 256)

    def dense(x, q, act=None):
        y = x @ q["kernel"].astype(dtype) + q["bias"].astype(dtype)
        return act(y) if act is not None else y

    relu = lambda v: jnp.maximum(v, 0)
    gs = jnp.concatenate([goal.astype(dtype), speed.astype(dtype)], -1)
    a = dense(jnp.concatenate([feats[0].astype(dtype), gs], -1),
              p["act_fc2"], relu)
    mean = jnp.concatenate([jax.nn.sigmoid(dense(a, p["actor1"])),
                            jnp.tanh(dense(a, p["actor2"]))], -1)
    c = dense(jnp.concatenate([feats[1].astype(dtype), gs], -1),
              p["crt_fc2"], relu)
    value = dense(c, p["critic"])
    return (value.astype(jnp.float32), mean.astype(jnp.float32),
            p["logstd"])

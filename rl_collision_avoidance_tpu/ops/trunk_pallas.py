"""Fused Pallas TPU kernels for the twin CNN trunks (forward + backward).

The PPO update phase is the training bottleneck: one fwd+bwd of the
2.17M-param twin-trunk CNN (reference ``model/net.py:16-80``) at minibatch
131,072 measures fwd ~11 ms / bwd ~113 ms in f32 (docs/PERF.md).  The
backward is HBM-bound, not FLOP-bound: XLA saves every conv activation for
the backward pass (conv1 out alone is 4.3 GB/trunk/minibatch), re-reads
them, and lowers the tiny-channel conv filter-gradient kernels far below
matmul rates.

These kernels collapse that traffic.  Each grid program pushes a tile of
samples through one whole trunk in VMEM:

* **forward** — conv1 (k5 s2 p1) -> relu -> conv2 (k3 s2 p1) -> relu ->
  flatten -> fc1 -> relu, writing only the (tile, 256) trunk features back
  to HBM.  No intermediate activation ever touches HBM.
* **backward** — recomputes the tile's activations in VMEM (FLOPs are
  cheap; both convs together are ~half the fc1 matmul) and accumulates the
  six parameter gradients across tiles directly in the VMEM-resident
  output blocks.  ``dX`` is NOT computed: the lidar observation is data,
  never differentiated through (the custom_vjp returns a zeros cotangent
  that XLA dead-code-eliminates).

Layout rules learned the hard way (v1 of this kernel was 34x slower than
XLA's forward):

* Nothing with a tiny minor dimension may live in VMEM: a (.., F=3)
  operand is lane-padded 3 -> 128 (42x), and every relayout/concat on it
  is near-unimplemented or glacial.  The conv1 patch matrix (B, L1, 5F)
  is therefore built by XLA in HBM — im2col traffic at bf16 costs ~1 ms
  per read vs hundreds of ms of in-kernel layout work.  (The all-XLA
  im2col apply is still a loser — models.policy.cnn_matmul_apply, 148k
  f32 / 225k bf16 steps/s end-to-end — because XLA also *differentiates
  through* the patch gather; here dX is never formed.)
* Mosaic cannot merge a sublane dim into the lane dim: ``(TB, L2, 32) ->
  (TB, 4096)`` is an unsupported shape cast.  The fc1 flatten instead
  goes through the TRANSPOSED flat matrix: ``transpose(conv2) ->
  (L2, 32, TB) -> reshape (4096, TB)`` (leading-dim merges are legal) and
  fc1/its gradients become single big-K dot_generals.
* Stride-2 window sampling is even/odd ``reshape(.., L/2, 2, C)`` on a
  sublane dim (legal) — never a strided slice.

The grid is (2 trunks, n_tiles) trunk-major: one trunk's weights stay
VMEM-resident across all its tiles, and the gradient output blocks
(indexed by trunk only) accumulate in place across the sequential tile
iterations.

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
    tile_fwd: int = 128
    tile_bwd: int = 128
    precision: str = "default"     # "default" = bf16 mult / f32 accum
    out_dtype: str = "float32"     # dtype of the (2, B, 256) trunk features
    interpret: bool = False

    @property
    def compute_dtype(self):
        return jnp.float32 if self.precision == "float32" else jnp.bfloat16


def _mm(a, b, precision, dims=None):
    """Matmul (or dot_general) at the configured MXU precision."""
    dt = jnp.float32 if precision == "float32" else jnp.bfloat16
    a = a.astype(dt)
    b = b.astype(dt)
    if dims is None:
        dims = (((a.ndim - 1,), (0,)), ((), ()))
    return jax.lax.dot_general(a, b, dimension_numbers=dims,
                               preferred_element_type=jnp.float32)


def _pad_l1(l1: int) -> int:
    """Conv1's spatial size rounded up to the bf16 sublane tile (16): the
    kernels' leading-dim merges ((TB, L1, C) -> (TB*L1, C)) are legal only
    when L1 is tile-aligned.  Padding rows are zero and sliced/zeroed out
    of every consumer."""
    return (l1 + 15) // 16 * 16


def _im2col_patches(x, dtype):
    """XLA-side im2col for conv1 (k5 s2 p1): (B, F, NB) -> (B, L1P, 5F).

    Tap-major/channel-minor column order matches ``w1.reshape(5F, 32)``.
    Built in HBM by XLA (one gather-shaped fusion); the kernels read it as
    a matmul-ready operand.  Spatial axis zero-padded L1 -> L1P (_pad_l1).
    """
    b, f, nb = x.shape
    l1 = nb // 2 - 1
    xt = jnp.swapaxes(x, -1, -2).astype(dtype)             # (B, NB, F)
    xp = jnp.pad(xt, ((0, 0), (1, 1), (0, 0)))             # (B, NB+2, F)
    cols = [xp[:, j:j + 2 * l1 - 1:2, :] for j in range(5)]
    p1 = jnp.concatenate(cols, axis=-1)                    # (B, L1, 5F)
    return jnp.pad(p1, ((0, 0), (0, _pad_l1(l1) - l1), (0, 0)))


def _trunk_tile_forward(p1, w1, b1, w2, b2, wf, bf, precision, l1):
    """One tile through one trunk; p1 (TB, L1P, 5F) conv1 patches
    (zero-padded past the true spatial size ``l1``).

    Returns the VMEM intermediates the backward reuses:
    (conv1, c2in, conv2, flat_t, out).
    """
    tb, l1p, k1 = p1.shape
    l2 = (l1 + 1) // 2
    y1 = _mm(p1.reshape(tb * l1p, k1), w1, precision) + b1
    conv1 = jnp.maximum(y1, 0.0).reshape(tb, l1p, 32)[:, :l1]

    # Stride-2 window sampling as even/odd reshapes (no strided slices):
    # with yp = pad(conv1), conv2_in tap k at position l is yp[2l + k].
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

    # fc1 without the (illegal) (TB, L2, 32) -> (TB, L2*32) lane merge:
    # transpose to (L2, 32, TB) and merge the LEADING dims instead — the
    # transposed flat matrix, contracted over its big K axis.
    flat_t = jnp.transpose(conv2, (1, 2, 0)).reshape(l2 * 32, tb)
    y3 = _mm(flat_t, wf, precision, dims=(((0,), (0,)), ((), ()))) + bf
    out = jnp.maximum(y3, 0.0)                             # (TB, 256)
    return conv1, c2in, conv2, flat_t, out


def _fwd_kernel(p1_ref, w1_ref, b1_ref, w2_ref, b2_ref, wf_ref, bf_ref,
                out_ref, *, precision, out_dtype, l1):
    *_, out = _trunk_tile_forward(
        p1_ref[...], w1_ref[0], b1_ref[0, 0], w2_ref[0], b2_ref[0, 0],
        wf_ref[0], bf_ref[0, 0], precision, l1)
    out_ref[0] = out.astype(out_dtype)


def _bwd_kernel(p1_ref, g_ref, w1_ref, b1_ref, w2_ref, b2_ref, wf_ref,
                bf_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dwf_ref,
                dbf_ref, *, precision, l1):
    tb, l1p, k1 = p1_ref.shape
    l2 = (l1 + 1) // 2
    w2 = w2_ref[0]
    p1 = p1_ref[...]
    conv1, (e2, o2, e2s), conv2, flat_t, out = _trunk_tile_forward(
        p1, w1_ref[0], b1_ref[0, 0], w2, b2_ref[0, 0], wf_ref[0],
        bf_ref[0, 0], precision, l1)

    rows = (((0,), (0,)), ((), ()))          # contract the sample axis
    gw = (((1,), (1,)), ((), ()))            # g @ W^T without materializing

    g1 = g_ref[0].astype(jnp.float32) * (out > 0.0)        # (TB, 256)
    dwf = _mm(flat_t, g1, precision,
              dims=(((1,), (0,)), ((), ())))               # (4096, 256)
    dbf = jnp.sum(g1, axis=0)

    # dflat_t = wf @ g1^T, then un-transpose back to sample-major
    dflat_t = _mm(wf_ref[0], g1, precision, dims=gw)       # (4096, TB)
    dconv2 = jnp.transpose(dflat_t.reshape(l2, 32, tb), (2, 0, 1))
    g2 = dconv2 * (conv2 > 0.0)                            # (TB, L2, 32)
    g2f = g2.reshape(-1, 32)
    dw2 = jnp.stack([_mm(c.reshape(-1, 32), g2f, precision, dims=rows)
                     for c in (e2, o2, e2s)])              # (3, 32, 32)
    db2 = jnp.sum(g2, axis=(0, 1))

    # Transposed conv2: scatter the three tap contributions back onto the
    # conv1 grid.  With t_k = g2 @ W2[k]^T, position 2m of conv1 receives
    # t_1[m]; position 2m+1 receives t_0[m+1] + t_2[m] (the left/right
    # paddings fall off the ends).  Interleave even/odd and trim.
    t0 = _mm(g2f, w2[0], precision, dims=gw).reshape(tb, l2, 32)
    t1 = _mm(g2f, w2[1], precision, dims=gw).reshape(tb, l2, 32)
    t2 = _mm(g2f, w2[2], precision, dims=gw).reshape(tb, l2, 32)
    d_odd = jnp.concatenate([t0[:, 1:], jnp.zeros_like(t0[:, :1])],
                            axis=1) + t2
    dconv1 = jnp.stack([t1, d_odd], axis=2).reshape(tb, 2 * l2, 32)[:, :l1]
    g3 = dconv1 * (conv1 > 0.0)                            # (TB, L1, 32)

    # zero-pad g3 back to L1P so the sample-axis contraction against the
    # padded patch matrix is tile-aligned (pad rows contribute nothing)
    g3p = jnp.pad(g3, ((0, 0), (0, l1p - l1), (0, 0)))
    dw1 = _mm(p1.reshape(tb * l1p, k1), g3p.reshape(-1, 32), precision,
              dims=rows)                                   # (5F, 32)
    db1 = jnp.sum(g3, axis=(0, 1))

    i = pl.program_id(1)
    contribs = ((dw1_ref, dw1), (db1_ref, db1[None]), (dw2_ref, dw2),
                (db2_ref, db2[None]), (dwf_ref, dwf), (dbf_ref, dbf[None]))

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


_WEIGHT_KEYS = ("w1", "b1", "w2", "b2", "wf", "bf")
_BIAS_KEYS = ("b1", "b2", "bf")


def _weight_specs(k1, flatdim):
    # Biases travel as (2, 1, X): Mosaic requires the block's second-to-last
    # dim be 8-divisible or equal to the array's, which a (1, X) block of a
    # (2, X) array violates — the singleton axis sidesteps it.  w1 travels
    # flattened to (2, 5F, 32) to match the patch-matrix contraction.
    full = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda t, i: (t,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    return [full(k1, 32), full(1, 32), full(3, 32, 32), full(1, 32),
            full(flatdim, 256), full(1, 256)]


def _weight_args(stacked, dtype):
    args = []
    for k in _WEIGHT_KEYS:
        v = stacked[k]
        if k in _BIAS_KEYS:
            v = v[:, None]                   # biases stay f32 (added post-mm)
        elif k == "w1":
            v = v.reshape(2, -1, 32).astype(dtype)
        else:
            v = v.astype(dtype)
        args.append(v)
    return args


def _compiler_params():
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=100 * 2**20)


def _trunk_dims(stacked):
    l2 = stacked["wf"].shape[1] // 32
    return 2 * l2 - 1, l2


def _fwd_call(stacked, p1, cfg: TrunkConfig):
    p1p, b = _pad_rows(p1, cfg.tile_fwd)
    bp, l1p, k1 = p1p.shape
    l1, l2 = _trunk_dims(stacked)
    assert l1p == _pad_l1(l1), \
        "patch matrix does not match the fc1 weight's conv output size"
    nt = bp // cfg.tile_fwd
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, precision=cfg.precision,
                          out_dtype=jnp.dtype(cfg.out_dtype), l1=l1),
        grid=(2, nt),
        in_specs=[pl.BlockSpec((cfg.tile_fwd, l1p, k1),
                               lambda t, i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + _weight_specs(k1, 32 * l2),
        out_specs=pl.BlockSpec((1, cfg.tile_fwd, 256),
                               lambda t, i: (t, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, bp, 256), jnp.dtype(cfg.out_dtype)),
        compiler_params=_compiler_params(),
        interpret=cfg.interpret,
    )(p1p, *_weight_args(stacked, cfg.compute_dtype))
    return out[:, :b]


def _bwd_call(stacked, p1, g, cfg: TrunkConfig):
    p1p, b = _pad_rows(p1, cfg.tile_bwd)
    bp, l1p, k1 = p1p.shape
    l1, l2 = _trunk_dims(stacked)
    gp, _ = _pad_rows(g, cfg.tile_bwd, axis=1)   # padded rows carry g = 0,
    # so they contribute nothing to any dW/db
    nt = bp // cfg.tile_bwd

    def gshape(k):
        if k in _BIAS_KEYS:
            return (2, 1) + stacked[k].shape[1:]
        if k == "w1":
            return (2, k1, 32)
        return (2,) + stacked[k].shape[1:]

    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, precision=cfg.precision, l1=l1),
        grid=(2, nt),
        in_specs=[
            pl.BlockSpec((cfg.tile_bwd, l1p, k1), lambda t, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cfg.tile_bwd, 256), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM),
        ] + _weight_specs(k1, 32 * l2),
        out_specs=_weight_specs(k1, 32 * l2),
        out_shape=[jax.ShapeDtypeStruct(gshape(k), jnp.float32)
                   for k in _WEIGHT_KEYS],
        compiler_params=_compiler_params(),
        interpret=cfg.interpret,
    )(p1p, gp, *_weight_args(stacked, cfg.compute_dtype))
    out = {}
    for k, g_ in zip(_WEIGHT_KEYS, grads):
        if k in _BIAS_KEYS:
            g_ = g_[:, 0]
        elif k == "w1":
            g_ = g_.reshape(stacked[k].shape)
        out[k] = g_
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_trunks(stacked, x, cfg: TrunkConfig):
    """Both trunk feature extractors: (B, F, NB) -> (2, B, 256).

    ``stacked``: dict of per-trunk-stacked parameters (see
    :func:`stack_trunk_params`).  Differentiable in ``stacked`` only; the
    cotangent of ``x`` is a zeros placeholder (DCE'd when unused — the
    observation is data in every PPO loss).
    """
    p1 = _im2col_patches(x, cfg.compute_dtype)
    return _fwd_call(stacked, p1, cfg)


def _fused_fwd(stacked, x, cfg):
    p1 = _im2col_patches(x, cfg.compute_dtype)
    token = jnp.zeros((0,), x.dtype)     # carries x's dtype for the zeros
    return _fwd_call(stacked, p1, cfg), (stacked, p1, token)


def _fused_bwd(cfg, res, g):
    stacked, p1, token = res
    l1, _ = _trunk_dims(stacked)
    x_shape = (p1.shape[0], p1.shape[2] // 5, 2 * l1 + 2)
    return (_bwd_call(stacked, p1, g, cfg),
            jnp.zeros(x_shape, token.dtype))


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
                     tile_fwd: int = 128, tile_bwd: int = 128,
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

"""Ring attention: sequence-parallel attention over a mesh axis.

Long-context headroom beyond the reference (SURVEY.md §5: sequence
parallelism is absent there; §7 stage 9 schedules it): Q and KV are sharded
along the sequence dimension across the mesh axis; KV blocks rotate around
the ring via `ppermute` while each device accumulates its queries'
online-softmax statistics — communication is point-to-point over ICI and
overlaps with the local attention compute (XLA latency-hiding scheduler).

Supports the full decoder self-attention surface of the training path
(models/decoder.py Decoder.__call__):
  - causal masking with global offsets,
  - COLUMN-FORM additive bias [B|1, H|1, 1, S] (the decoder's ALiBi form,
    mpt/attention.py:457-464 equivalent): per-row-uniform shifts cancel in
    the online softmax exactly as in a single softmax, and the bias block
    rotates around the ring with its KV block,
  - eq/ge segment-id masks ([B, S] ids; kv ids rotate with KV),
  - MQA/GQA: kv blocks rotate at their true H_kv width; the broadcast to
    H query heads happens inside the local block compute.

Differentiation is a TWO-PASS custom VJP (the flash-attention backward
per block pair): the forward saves only (q, k, v, out, lse) — all
O(S·D/N) per device — and the backward re-rotates the KV blocks,
accumulating dq locally while each block's dk/dv (and dbias) gradient
rides the ring with its block and is delivered home by one final
rotation. No O(S²) probability matrices and no per-step KV copies
survive the forward. (`grad_mode="ad"` keeps the plain autodiff-through-
scan path for A/B testing; its scan carries save each step's rotated KV
pair — the full O(S·D) KV of one layer transiently in backward.)

Implemented with shard_map over a mesh axis (default the dedicated "seq"
axis, parallel/mesh.py); batch stays sharded over (data, fsdp) and heads
over "tensor" inside the shard_map, so sp composes with dp/fsdp/tp without
involuntary all-gathers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from otter_tpu.ops.masks import DEFAULT_MASK_VALUE


def _block_logits(q, k, q_offset, kv_offset, *, causal, sm_scale,
                  bias=None, q_ids=None, kv_ids=None, ids_mode="eq",
                  mask_value=DEFAULT_MASK_VALUE):
    """Masked f32 attention logits for one (q block, kv block) pair.
    q [B,H,Sq,D], k [B,H_kv,Sk,D] (kv heads broadcast here); offsets are
    the global positions of the first row/col. bias [B|1,H|1,1,Sk]."""
    h, h_kv = q.shape[1], k.shape[1]
    if h_kv != h:
        k = jnp.repeat(k, h // h_kv, axis=1)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * sm_scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    allowed = None
    if causal:
        rows = q_offset + jnp.arange(q.shape[2])[:, None]
        cols = kv_offset + jnp.arange(k.shape[2])[None, :]
        allowed = (cols <= rows)[None, None]
    if q_ids is not None:
        qi = q_ids[:, None, :, None].astype(jnp.int32)
        ki = kv_ids[:, None, None, :].astype(jnp.int32)
        idm = (qi == ki) if ids_mode == "eq" else (qi >= ki)
        allowed = idm if allowed is None else (allowed & idm)
    if allowed is not None:
        logits = jnp.where(allowed, logits, mask_value)
    return logits


def _local_attention_stats(q, k, v, q_offset, kv_offset, *, causal,
                           sm_scale, bias=None, q_ids=None, kv_ids=None,
                           ids_mode="eq", mask_value=DEFAULT_MASK_VALUE):
    """Block attention returning (out_unnormalized, m, l) for online
    combination."""
    logits = _block_logits(q, k, q_offset, kv_offset, causal=causal,
                           sm_scale=sm_scale, bias=bias, q_ids=q_ids,
                           kv_ids=kv_ids, ids_mode=ids_mode,
                           mask_value=mask_value)
    h, h_kv = q.shape[1], v.shape[1]
    if h_kv != h:
        v = jnp.repeat(v, h // h_kv, axis=1)
    m = jnp.max(logits, axis=-1, keepdims=True)           # [B,H,Sq,1]
    p = jnp.exp(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out, m, l


class _RingConfig(NamedTuple):
    """Hashable static config for the custom-VJP rules."""
    mesh: Mesh
    axis: str
    causal: bool
    scale: float
    ids_mode: str


def _build_specs(cfg: _RingConfig, q, k, bias, q_ids):
    """shard_map PartitionSpecs mirroring the ambient activation sharding
    so sp composes with dp/fsdp/tp (a None here would all-gather those
    dims)."""
    from otter_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS, TENSOR_AXIS

    mesh, axis = cfg.mesh, cfg.axis
    batch_axes = tuple(a for a in (DATA_AXIS, FSDP_AXIS)
                       if a != axis and a in mesh.shape)

    def dim(size, names):
        if not names:
            return None
        sz = 1
        for a in (names if isinstance(names, tuple) else (names,)):
            sz *= mesh.shape.get(a, 1)
        return names if sz > 1 and size % sz == 0 else None

    bspec = dim(q.shape[0], batch_axes)
    tsize = mesh.shape.get(TENSOR_AXIS, 1)
    hspec = dim(q.shape[1], TENSOR_AXIS) if tsize > 1 else None
    kv_hspec = dim(k.shape[1], TENSOR_AXIS) if tsize > 1 else None
    # heads shard JOINTLY or not at all: q heads sharded while kv heads
    # stay replicated (tp not dividing h_kv) would pair each device's
    # local q heads with the wrong kv heads — silent garbage attention
    if (hspec is None) != (kv_hspec is None):
        hspec = kv_hspec = None
    specs = {
        "q": P(bspec, hspec, axis, None),
        "kv": P(bspec, kv_hspec, axis, None),
        "lse": P(bspec, hspec, axis, None),
        "bias": None, "ids": None,
    }
    if bias is not None:
        # bias heads follow the q-head layout (sharded only when q heads
        # are, and the bias head count divides) — a bias sharded against
        # replicated q heads would mispair the same way
        specs["bias"] = P(dim(bias.shape[0], batch_axes),
                          dim(bias.shape[1], TENSOR_AXIS)
                          if hspec is not None else None, None, axis)
    if q_ids is not None:
        specs["ids"] = P(dim(q_ids.shape[0], batch_axes), axis)
    return specs


def _ring_perm(n):
    return [(j, (j + 1) % n) for j in range(n)]


def _rotate(axis, perm, *xs):
    return tuple(None if x is None else jax.lax.ppermute(x, axis, perm)
                 for x in xs)


def _ring_local_impl() -> str:
    """Local-block backend: the Pallas flash kernel on TPU (keeps the
    O(chunk²) logits in VMEM), jnp einsum elsewhere. OTTER_RING_IMPL
    forces either ("pallas" | "einsum")."""
    import os
    forced = os.environ.get("OTTER_RING_IMPL")
    if forced:
        return forced
    return "pallas" if jax.default_backend() == "tpu" else "einsum"


def _ring_fwd_pass(cfg: _RingConfig, q, k, v, bias, q_ids, kv_ids):
    """Forward ring: returns (out, lse), both sharded along `axis`.

    Each local block yields its NORMALIZED output + lse; blocks merge by
    lse weights (out_a·e^{lse_a−lse} + out_b·e^{lse_b−lse}). This form
    lets the diagonal block run the Pallas flash kernel with causal=True
    and every off-diagonal block with causal=False — the own-block-first
    loop structure makes `causal` static per call site."""
    mesh, axis = cfg.mesh, cfg.axis
    n = mesh.shape[axis]
    chunk = q.shape[2] // n
    specs = _build_specs(cfg, q, k, bias, q_ids)
    perm = _ring_perm(n)
    use_kernel = _ring_local_impl() == "pallas"
    interp = jax.default_backend() != "tpu"

    def local_fn(q_l, k_l, v_l, bias_l, qid_l, kid_l):
        idx = jax.lax.axis_index(axis)
        q_off = idx * chunk

        def block(k_blk, v_blk, bias_blk, kid_blk, kv_off, diag):
            """-> (normalized out f32, lse [B,H,Sq,1] f32)."""
            if use_kernel:
                from otter_tpu.ops import flash_attention as fa
                h_loc, hkv_loc = q_l.shape[1], k_blk.shape[1]
                kf, vf = k_blk, v_blk
                if hkv_loc != h_loc:
                    kf = jnp.repeat(kf, h_loc // hkv_loc, axis=1)
                    vf = jnp.repeat(vf, h_loc // hkv_loc, axis=1)
                o_b, lse_b = fa.flash_attention(
                    q_l, kf, vf, bias=bias_blk, q_ids=qid_l,
                    kv_ids=kid_blk, ids_mode=cfg.ids_mode,
                    causal=diag and cfg.causal, sm_scale=cfg.scale,
                    interpret=interp, return_lse=True)
                return o_b.astype(jnp.float32), lse_b[..., None]
            out, m, l = _local_attention_stats(
                q_l, k_blk, v_blk, q_off, kv_off, causal=cfg.causal,
                sm_scale=cfg.scale, bias=bias_blk, q_ids=qid_l,
                kv_ids=kid_blk, ids_mode=cfg.ids_mode)
            l = jnp.where(l == 0.0, 1.0, l)
            return out / l, m + jnp.log(l)

        def merge(o_a, lse_a, o_b, lse_b):
            lse = jnp.logaddexp(lse_a, lse_b)
            return (o_a * jnp.exp(lse_a - lse)
                    + o_b * jnp.exp(lse_b - lse), lse)

        # own (diagonal) block first, then N-1 rotate-then-compute steps:
        # no dead final rotation, and the merge starts from real values
        acc, lse = block(k_l, v_l, bias_l, kid_l, q_off, diag=True)

        def step(carry, i):
            k_blk, v_blk, bias_blk, kid_blk, acc, lse = carry
            k_blk, v_blk, bias_blk, kid_blk = _rotate(
                axis, perm, k_blk, v_blk, bias_blk, kid_blk)
            src = (idx - i) % n        # which shard this block came from

            def compute(_):
                o_b, lse_b = block(k_blk, v_blk, bias_blk, kid_blk,
                                   src * chunk, diag=False)
                return merge(acc, lse, o_b, lse_b)

            if cfg.causal:
                # blocks strictly above the diagonal (src > idx) are
                # fully masked under causality: skip their compute.
                # Per-device cond divergence is safe — the branches hold
                # no collectives, only the carried rotation does
                acc, lse = jax.lax.cond(
                    src > idx, lambda _: (acc, lse), compute, None)
            else:
                acc, lse = compute(None)
            return (k_blk, v_blk, bias_blk, kid_blk, acc, lse), None

        (_, _, _, _, acc, lse), _ = jax.lax.scan(
            step, (k_l, v_l, bias_l, kid_l, acc, lse), jnp.arange(1, n))
        return acc.astype(q_l.dtype), lse

    in_specs = (specs["q"], specs["kv"], specs["kv"],
                specs["bias"], specs["ids"], specs["ids"])
    # check_vma=False: pallas_call emits ShapeDtypeStructs without vma
    # annotations, which the varying-across-mesh checker rejects inside
    # shard_map. The backward shard_map keeps the checker (it caught the
    # broadcast-dim psum bug); the forward's specs are exercised by the
    # dp x fsdp x sp x tp parity tests
    return jax.shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                         out_specs=(specs["q"], specs["lse"]),
                         check_vma=not use_kernel)(
        q, k, v, bias, q_ids, kv_ids)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ring_vjp(cfg: _RingConfig, q, k, v, bias, q_ids, kv_ids):
    out, _ = _ring_fwd_pass(cfg, q, k, v, bias, q_ids, kv_ids)
    return out


def _ring_vjp_fwd(cfg, q, k, v, bias, q_ids, kv_ids):
    out, lse = _ring_fwd_pass(cfg, q, k, v, bias, q_ids, kv_ids)
    return out, (q, k, v, bias, q_ids, kv_ids, out, lse)


def _ring_vjp_bwd(cfg, res, g):
    """Second ring pass (flash-attention backward per block pair): dq
    accumulates locally; each KV block's (dk, dv, dbias) accumulator
    rotates WITH its block and one final rotation delivers it home.
    Residuals and live buffers are all O(S·D/N) per device; the only
    O(chunk²) object is the transient per-step p matrix."""
    q, k, v, bias, q_ids, kv_ids, out, lse = res
    mesh, axis = cfg.mesh, cfg.axis
    n = mesh.shape[axis]
    chunk = q.shape[2] // n
    specs = _build_specs(cfg, q, k, bias, q_ids)
    perm = _ring_perm(n)

    def local_fn(q_l, k_l, v_l, bias_l, qid_l, kid_l, o_l, do_l, lse_l):
        idx = jax.lax.axis_index(axis)
        q_off = idx * chunk
        do32 = do_l.astype(jnp.float32)
        delta = jnp.sum(do32 * o_l.astype(jnp.float32), -1,
                        keepdims=True)                    # [B,H,Sq,1]
        # head-group math from LOCAL (per-shard) shapes: _build_specs
        # guarantees q and kv heads shard jointly or not at all, so the
        # local ratio equals the global one — using global h/h_kv here
        # breaks under tp (heads halve locally, the ratio doesn't)
        h_loc, hkv_loc = q_l.shape[1], k_l.shape[1]
        grp = h_loc // hkv_loc

        def block_grads(k_blk, v_blk, bias_blk, kid_blk, kv_off):
            logits = _block_logits(
                q_l, k_blk, q_off, kv_off, causal=cfg.causal,
                sm_scale=cfg.scale, bias=bias_blk, q_ids=qid_l,
                kv_ids=kid_blk, ids_mode=cfg.ids_mode)
            p = jnp.exp(logits - lse_l)        # [B,H,Sq,Sk]; masked -> 0
            v_full = (jnp.repeat(v_blk, grp, axis=1) if grp > 1
                      else v_blk).astype(jnp.float32)
            k_full = (jnp.repeat(k_blk, grp, axis=1) if grp > 1
                      else k_blk).astype(jnp.float32)
            dv_full = jnp.einsum("bhqk,bhqd->bhkd", p, do32)
            dp = jnp.einsum("bhqd,bhkd->bhqk", do32, v_full)
            dlog = p * (dp - delta)            # dlogits
            dq_b = jnp.einsum("bhqk,bhkd->bhqd", dlog,
                              k_full) * cfg.scale
            dk_full = jnp.einsum("bhqk,bhqd->bhkd", dlog,
                                 q_l.astype(jnp.float32)) * cfg.scale

            def to_kv_heads(x):                # sum query-head groups
                if grp == 1:
                    return x
                b_, _, sk, d_ = x.shape
                return x.reshape(b_, hkv_loc, grp, sk, d_).sum(2)

            db_b = None
            if bias_blk is not None:
                db_b = jnp.sum(dlog, axis=2, keepdims=True)  # [B,H,1,Sk]
                if bias_blk.shape[1] == 1:
                    db_b = jnp.sum(db_b, axis=1, keepdims=True)
                elif bias_blk.shape[1] != h_loc:
                    # kv-head-width bias: fold each query-head group
                    assert bias_blk.shape[1] == hkv_loc and grp > 1
                    db_b = db_b.reshape(db_b.shape[0], hkv_loc, grp, 1,
                                        db_b.shape[-1]).sum(2)
                if bias_blk.shape[0] == 1:
                    db_b = jnp.sum(db_b, axis=0, keepdims=True)
            return dq_b, to_kv_heads(dk_full), to_kv_heads(dv_full), db_b

        dq, dk_acc, dv_acc, db_acc = block_grads(k_l, v_l, bias_l,
                                                 kid_l, q_off)

        def step(carry, i):
            (k_blk, v_blk, bias_blk, kid_blk, dk_a, dv_a, db_a,
             dq) = carry
            # the block AND its gradient accumulator travel together
            k_blk, v_blk, bias_blk, kid_blk, dk_a, dv_a, db_a = _rotate(
                axis, perm, k_blk, v_blk, bias_blk, kid_blk, dk_a, dv_a,
                db_a)
            src = (idx - i) % n

            def compute(_):
                dq_b, dk_b, dv_b, db_b = block_grads(
                    k_blk, v_blk, bias_blk, kid_blk, src * chunk)
                return (dq + dq_b, dk_a + dk_b, dv_a + dv_b,
                        None if db_a is None else db_a + db_b)

            if cfg.causal:
                # fully-masked above-diagonal blocks contribute zero
                # gradient: skip them (branches hold no collectives)
                dq, dk_a, dv_a, db_a = jax.lax.cond(
                    src > idx, lambda _: (dq, dk_a, dv_a, db_a),
                    compute, None)
            else:
                dq, dk_a, dv_a, db_a = compute(None)
            return (k_blk, v_blk, bias_blk, kid_blk, dk_a, dv_a, db_a,
                    dq), None

        (_, _, _, _, dk_acc, dv_acc, db_acc, dq), _ = jax.lax.scan(
            step, (k_l, v_l, bias_l, kid_l, dk_acc, dv_acc, db_acc, dq),
            jnp.arange(1, n))
        if n > 1:
            # blocks are n-1 hops from home; one more rotation delivers
            # each block's accumulated gradient to its owner
            dk_acc, dv_acc, db_acc = _rotate(axis, perm, dk_acc, dv_acc,
                                             db_acc)

        # broadcast-dim gradients are PER-SHARD PARTIALS wherever the
        # inputs were sharded along a mesh axis the output's spec does
        # not carry (bias broadcast over a sharded batch/head dim; MQA
        # kv heads under tp while q heads are tensor-sharded): psum the
        # difference so the out_spec's replication claim is true
        def names(entry):
            if entry is None:
                return ()
            return tuple(entry) if isinstance(entry, tuple) else (entry,)

        def psum_missing(x, in_entry, out_entry):
            if x is None:
                return x
            for nm in set(names(in_entry)) - set(names(out_entry)):
                x = jax.lax.psum(x, nm)
            return x

        dk_acc = psum_missing(dk_acc, specs["q"][1], specs["kv"][1])
        dv_acc = psum_missing(dv_acc, specs["q"][1], specs["kv"][1])
        if db_acc is not None:
            db_acc = psum_missing(db_acc, specs["q"][0],
                                  specs["bias"][0])
            db_acc = psum_missing(db_acc, specs["q"][1],
                                  specs["bias"][1])
        db_out = (None if db_acc is None
                  else db_acc.astype(bias_l.dtype
                                     if bias_l is not None
                                     else jnp.float32))
        return (dq.astype(q_l.dtype), dk_acc.astype(k_l.dtype),
                dv_acc.astype(v_l.dtype), db_out)

    in_specs = (specs["q"], specs["kv"], specs["kv"], specs["bias"],
                specs["ids"], specs["ids"], specs["q"], specs["q"],
                specs["lse"])
    out_specs = (specs["q"], specs["kv"], specs["kv"], specs["bias"])
    dq, dk, dv, dbias = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)(
        q, k, v, bias, q_ids, kv_ids, out, g, lse)

    def f0(x):
        return (None if x is None
                else np.zeros(x.shape, jax.dtypes.float0))

    return dq, dk, dv, dbias, f0(q_ids), f0(kv_ids)


_ring_vjp.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


def _ring_ad(cfg: _RingConfig, q, k, v, bias, q_ids, kv_ids):
    """Plain autodiff-through-scan implementation (A/B reference for the
    custom VJP). jax.checkpoint around each block's stats keeps the
    O(chunk²) probability matrices out of the residuals; the scan still
    saves each step's rotated KV pair (full O(S·D) KV of one layer,
    transient under per-layer remat)."""
    mesh, axis = cfg.mesh, cfg.axis
    n = mesh.shape[axis]
    chunk = q.shape[2] // n
    specs = _build_specs(cfg, q, k, bias, q_ids)
    perm = _ring_perm(n)

    def local_fn(q_l, k_l, v_l, bias_l, qid_l, kid_l):
        idx = jax.lax.axis_index(axis)
        q_off = idx * chunk

        stats = jax.checkpoint(
            lambda k_, v_, b_, ki_, kv_off: _local_attention_stats(
                q_l, k_, v_, q_off, kv_off, causal=cfg.causal,
                sm_scale=cfg.scale, bias=b_, q_ids=qid_l, kv_ids=ki_,
                ids_mode=cfg.ids_mode))

        acc, m, l = stats(k_l, v_l, bias_l, kid_l, q_off)

        def step(carry, i):
            k_blk, v_blk, bias_blk, kid_blk, acc, m, l = carry
            k_blk, v_blk, bias_blk, kid_blk = _rotate(
                axis, perm, k_blk, v_blk, bias_blk, kid_blk)
            src = (idx - i) % n
            out_b, m_b, l_b = stats(k_blk, v_blk, bias_blk, kid_blk,
                                    src * chunk)
            m_new = jnp.maximum(m, m_b)
            alpha = jnp.exp(m - m_new)
            beta = jnp.exp(m_b - m_new)
            acc = acc * alpha + out_b * beta
            l = l * alpha + l_b * beta
            return (k_blk, v_blk, bias_blk, kid_blk, acc, m_new, l), None

        (_, _, _, _, acc, m, l), _ = jax.lax.scan(
            step, (k_l, v_l, bias_l, kid_l, acc, m, l), jnp.arange(1, n))
        l = jnp.where(l == 0.0, 1.0, l)
        return (acc / l).astype(q_l.dtype)

    in_specs = (specs["q"], specs["kv"], specs["kv"], specs["bias"],
                specs["ids"], specs["ids"])
    return jax.shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                         out_specs=specs["q"])(q, k, v, bias, q_ids,
                                               kv_ids)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   *, mesh: Mesh, axis: str = "seq",
                   causal: bool = True,
                   sm_scale: Optional[float] = None,
                   bias: Optional[jnp.ndarray] = None,
                   q_ids: Optional[jnp.ndarray] = None,
                   kv_ids: Optional[jnp.ndarray] = None,
                   ids_mode: str = "eq",
                   grad_mode: str = "ring") -> jnp.ndarray:
    """q [B, H, S, D], k/v [B, H_kv, S, D] with S sharded over `axis`;
    returns [B, H, S, D] with the same sharding. The ring rotates KV (and
    the column bias / kv_ids blocks with it) by one neighbor per step
    (jax.lax.ppermute), N-1 rotations total.

    bias must be COLUMN-FORM [B|1, H|1, 1, S]: a per-column additive term
    (ALiBi relative-to-last-row). Row-dependent biases would need [Sq, Sk]
    blocks; the decoder never produces one outside the decode path.

    grad_mode: "ring" (default) differentiates via the two-pass custom
    VJP; "ad" uses plain autodiff through the forward scan (A/B path).
    """
    d = q.shape[-1]
    scale = float(sm_scale if sm_scale is not None else 1.0 / (d ** 0.5))
    n = mesh.shape[axis]
    assert q.shape[2] % n == 0, (q.shape[2], n)
    if bias is not None:
        assert bias.ndim == 4 and bias.shape[2] == 1, bias.shape
    if (q_ids is None) != (kv_ids is None):
        raise ValueError("q_ids and kv_ids must be passed together")
    cfg = _RingConfig(mesh=mesh, axis=axis, causal=causal, scale=scale,
                      ids_mode=ids_mode)
    if grad_mode == "ad":
        return _ring_ad(cfg, q, k, v, bias, q_ids, kv_ids)
    if grad_mode != "ring":
        raise ValueError(f"unknown grad_mode {grad_mode!r} "
                         "(expected 'ring' or 'ad')")
    return _ring_vjp(cfg, q, k, v, bias, q_ids, kv_ids)

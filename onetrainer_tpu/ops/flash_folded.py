"""Folded-layout flash attention: q/k/v/o live in HBM as [B, S, H*dp].

Why this kernel exists (r4, VERDICT r3 #4): the stock Pallas flash
kernel takes [B, H, S, dp] operands. For the SD families dp=64, and any
HBM array whose minor dimension is 64 pads 2x inside the TPU's (8, 128)
tile. At SDXL bs4 HBM pressure, XLA "compresses" the padded
saved/recomputed q/k/v/o tensors around every attention call — per-HLO
attribution measured ~139 GB/step of compression copy pairs (25% of
step bytes) plus [B,S,H,dp]<->[B,H,S,dp] transpose traffic (BASELINE.md
2026-08-17/18). In the folded layout the minor dimension is H*dp
(512/640/1280/1536 — tile-aligned), so the padded tensors and the
copies never exist: the qkv projections' natural [B, S, H*dp] output
feeds the kernel directly, and the attention output feeds the out
projection directly.

Block layout: Mosaic requires the last block dimension to be a multiple
of 128 (measured: 64-lane blocks are rejected, experiments/
exp_flash_folded.py r4), so each program takes a 128-lane block =
``hpb = 128 // dp`` heads (2 for dp=64, 1 for dp=128) and splits heads
with static lane slices on the loaded VMEM values — a VPU relayout that
is noise next to the HBM traffic it deletes. lse is carried as
[B, H/hpb, hpb, S] so its (hpb, seq-block) trailing block dims satisfy
the same rule (hpb == array dim), and reshaped to [B, H, S] outside —
a metadata-only merge of two non-minor dims.

Semantics match ops/attention.py's flash path: non-causal, optional
kv-drop masking (text padding / ragged-pad tails) via an additive fp32
bias row, fp32 online softmax, sm_scale from the REAL head dim. The
backward is a custom VJP (dq kernel row-parallel over q blocks; dk/dv
kernel column-parallel over kv blocks) whose residuals are the folded
q/k/v/o + lse — nothing with a sub-128 minor dimension is ever saved.

Masking numerics: the mask bias is a finite -1e30. fp32 absorption
(-1e30 + score == -1e30 exactly) means a fully-masked chunk seen while
the running max is still the -1e30 init gets p==1 transiently, but the
first chunk containing any real kv wipes it (alpha = exp(-1e30 - m) ==
0). Rows are required to keep >= 1 real kv (caller contract), so no
output row ever ends all-masked. Padded q rows are zeros and are NOT
masked: they see a finite uniform softmax, the caller slices them off,
and their dk/dv contributions vanish because their upstream gradient
rows are zero.

Reference counterpart: the torch stack gets attention from
torch.nn.functional.scaled_dot_product_attention / flash-attn wheels
(reference modules/modelSetup/* via diffusers); this is the TPU-native
equivalent, not a translation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30
_LANES = 128


def _interpret() -> bool:
    """Pallas interpret mode off-TPU so the CPU test farm can execute the
    kernels (the dispatcher only routes here on TPU or under tests)."""
    return jax.default_backend() != "tpu"


def _heads_per_block(dp: int) -> int:
    assert _LANES % dp == 0, dp
    return _LANES // dp


def _check_specs(in_specs, args, out_specs, out_shapes):
    """Trace-time enforcement of Mosaic's tiling rule — the last two
    block dims must be divisible by (8, 128) respectively or equal to
    the array dims. CPU interpret mode doesn't check this, so a spec
    that only a real-TPU compile rejects (the [B, Skv] bias regression,
    bench r4 sd3) would otherwise sail through the whole CPU suite."""
    for spec, arr in (list(zip(in_specs, args))
                      + list(zip(out_specs, out_shapes))):
        block, shape = spec.block_shape, arr.shape
        if len(block) < 2:
            continue
        ok_minor = block[-1] % _LANES == 0 or block[-1] == shape[-1]
        ok_sub = block[-2] % 8 == 0 or block[-2] == shape[-2]
        assert ok_minor and ok_sub, (
            f"Mosaic-illegal block {tuple(block)} for array "
            f"{tuple(shape)} {arr.dtype}")


# ---------------------------------------------------------------- forward


def _fwd_kernel(*refs, block_k: int, sm_scale: float, dp: int,
                has_bias: bool):
    if has_bias:
        q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref = refs
        bias_ref = None
    hpb = _heads_per_block(dp)
    qb = q_ref[0]                                  # [bq, hpb*dp] bf16
    bq = qb.shape[0]
    skv = k_ref.shape[1]
    nchunks = skv // block_k

    def body(i, carry):
        ms, ls, accs = carry
        kcb = k_ref[0, pl.ds(i * block_k, block_k), :]       # [bk, hpb*dp]
        vcb = v_ref[0, pl.ds(i * block_k, block_k), :]
        bias = None
        if bias_ref is not None:
            bias = bias_ref[0, 0, pl.ds(i * block_k, block_k)][None, :]
        new_ms, new_ls, new_accs = [], [], []
        for j in range(hpb):
            sl = slice(j * dp, (j + 1) * dp)
            s = jax.lax.dot_general(
                qb[:, sl], kcb[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale  # [bq, bk]
            if bias is not None:
                s = s + bias
            m_new = jnp.maximum(ms[j], jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(ms[j] - m_new)
            p = jnp.exp(s - m_new)
            new_ls.append(ls[j] * alpha + jnp.sum(p, axis=1, keepdims=True))
            new_accs.append(accs[j] * alpha + jax.lax.dot_general(
                p.astype(vcb.dtype), vcb[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            new_ms.append(m_new)
        return tuple(new_ms), tuple(new_ls), tuple(new_accs)

    m0 = tuple(jnp.full((bq, 1), _NEG_INF, jnp.float32)
               for _ in range(hpb))
    l0 = tuple(jnp.zeros((bq, 1), jnp.float32) for _ in range(hpb))
    acc0 = tuple(jnp.zeros((bq, dp), jnp.float32) for _ in range(hpb))
    ms, ls, accs = jax.lax.fori_loop(0, nchunks, body, (m0, l0, acc0))
    o_ref[0] = jnp.concatenate(
        [(accs[j] / ls[j]).astype(o_ref.dtype) for j in range(hpb)], axis=1)
    lse_ref[0, 0] = jnp.concatenate(
        [(ms[j] + jnp.log(ls[j])).reshape(1, bq) for j in range(hpb)],
        axis=0)                                    # [hpb, bq]


def _fwd(q, k, v, bias, num_heads: int, sm_scale: float,
         block_q: int, block_k: int):
    b, sq, inner = q.shape
    skv = k.shape[1]
    dp = inner // num_heads
    hpb = _heads_per_block(dp)
    hg = num_heads // hpb
    grid = (b, hg, sq // block_q)

    in_specs = [
        pl.BlockSpec((1, block_q, _LANES), lambda bi, h, iq: (bi, iq, h)),
        pl.BlockSpec((1, skv, _LANES), lambda bi, h, iq: (bi, 0, h)),
        pl.BlockSpec((1, skv, _LANES), lambda bi, h, iq: (bi, 0, h)),
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, skv), lambda bi, h, iq: (bi, 0, 0)))
        args.append(bias)

    kern = functools.partial(_fwd_kernel, block_k=block_k,
                             sm_scale=sm_scale, dp=dp,
                             has_bias=bias is not None)
    out_specs = [
        pl.BlockSpec((1, block_q, _LANES),
                     lambda bi, h, iq: (bi, iq, h)),
        pl.BlockSpec((1, 1, hpb, block_q),
                     lambda bi, h, iq: (bi, h, 0, iq)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, sq, inner), q.dtype),
        jax.ShapeDtypeStruct((b, hg, hpb, sq), jnp.float32),
    ]
    _check_specs(in_specs, args, out_specs, out_shape)
    o, lse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * sq * skv * dp,
            bytes_accessed=2 * (2 * b * sq * inner + 2 * b * skv * inner),
            transcendentals=b * num_heads * sq * skv,
        ),
        interpret=_interpret(),
    )(*args)
    return o, lse.reshape(b, num_heads, sq)


# --------------------------------------------------------------- backward


def _dq_kernel(*refs, block_k: int, sm_scale: float, dp: int,
               has_bias: bool):
    if has_bias:
        q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, bias_ref, dq_ref = refs
    else:
        q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dq_ref = refs
        bias_ref = None
    hpb = _heads_per_block(dp)
    qb = q_ref[0]                                   # [bq, hpb*dp]
    dob = do_ref[0]
    ob = o_ref[0]
    bq = qb.shape[0]
    skv = k_ref.shape[1]
    nchunks = skv // block_k
    lses, deltas = [], []
    for j in range(hpb):
        sl = slice(j * dp, (j + 1) * dp)
        lses.append(lse_ref[0, 0, j].reshape(bq, 1))          # [bq, 1]
        deltas.append(jnp.sum(dob[:, sl].astype(jnp.float32)
                              * ob[:, sl].astype(jnp.float32),
                              axis=1, keepdims=True))          # [bq, 1]

    def body(i, dq_accs):
        kcb = k_ref[0, pl.ds(i * block_k, block_k), :]
        vcb = v_ref[0, pl.ds(i * block_k, block_k), :]
        bias = None
        if bias_ref is not None:
            bias = bias_ref[0, 0, pl.ds(i * block_k, block_k)][None, :]
        new = []
        for j in range(hpb):
            sl = slice(j * dp, (j + 1) * dp)
            s = jax.lax.dot_general(
                qb[:, sl], kcb[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            if bias is not None:
                s = s + bias
            p = jnp.exp(s - lses[j])                            # [bq, bk]
            dpv = jax.lax.dot_general(
                dob[:, sl], vcb[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # [bq, bk]
            ds = (p * (dpv - deltas[j]) * sm_scale).astype(kcb.dtype)
            new.append(dq_accs[j] + jax.lax.dot_general(
                ds, kcb[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        return tuple(new)

    z = tuple(jnp.zeros((bq, dp), jnp.float32) for _ in range(hpb))
    dq_accs = jax.lax.fori_loop(0, nchunks, body, z)
    dq_ref[0] = jnp.concatenate(
        [dq_accs[j].astype(dq_ref.dtype) for j in range(hpb)], axis=1)


def _dkv_kernel(*refs, block_q: int, sm_scale: float, dp: int,
                has_bias: bool):
    if has_bias:
        (q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, bias_ref,
         dk_ref, dv_ref) = refs
    else:
        q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dk_ref, dv_ref = refs
        bias_ref = None
    hpb = _heads_per_block(dp)
    kcb = k_ref[0]                                  # [bk, hpb*dp]
    vcb = v_ref[0]
    bk = kcb.shape[0]
    sq = q_ref.shape[1]
    nchunks = sq // block_q
    bias_col = None
    if bias_ref is not None:
        bias_col = bias_ref[0, 0].reshape(bk, 1)       # [bk, 1]

    def body(i, carry):
        dk_accs, dv_accs = carry
        qcb = q_ref[0, pl.ds(i * block_q, block_q), :]           # [bq, ...]
        docb = do_ref[0, pl.ds(i * block_q, block_q), :]
        ocb = o_ref[0, pl.ds(i * block_q, block_q), :]
        new_dk, new_dv = [], []
        for j in range(hpb):
            sl = slice(j * dp, (j + 1) * dp)
            qc, doc, oc = qcb[:, sl], docb[:, sl], ocb[:, sl]
            lse = lse_ref[0, 0, j, pl.ds(i * block_q, block_q)][None, :]
            delta = jnp.sum(doc.astype(jnp.float32)
                            * oc.astype(jnp.float32), axis=1)[None, :]
            # transposed score block: [bk, bq]
            st = jax.lax.dot_general(
                kcb[:, sl], qc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            if bias_col is not None:
                st = st + bias_col
            pt = jnp.exp(st - lse)                               # [bk, bq]
            new_dv.append(dv_accs[j] + jax.lax.dot_general(
                pt.astype(doc.dtype), doc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dpt = jax.lax.dot_general(
                vcb[:, sl], doc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)              # [bk, bq]
            dst = (pt * (dpt - delta) * sm_scale).astype(kcb.dtype)
            new_dk.append(dk_accs[j] + jax.lax.dot_general(
                dst, qc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        return tuple(new_dk), tuple(new_dv)

    z = tuple(jnp.zeros((bk, dp), jnp.float32) for _ in range(hpb))
    dk_accs, dv_accs = jax.lax.fori_loop(0, nchunks, body, (z, z))
    dk_ref[0] = jnp.concatenate(
        [dk_accs[j].astype(dk_ref.dtype) for j in range(hpb)], axis=1)
    dv_ref[0] = jnp.concatenate(
        [dv_accs[j].astype(dv_ref.dtype) for j in range(hpb)], axis=1)


def _dkv_stream_kernel(*refs, sm_scale: float, dp: int, has_bias: bool):
    """q-streaming dk/dv: the grid's innermost dimension walks q blocks
    while the dk/dv output block (indexed by the kv block only) stays
    VMEM-resident across the revisits and accumulates in fp32. Unlike
    `_dkv_kernel`, nothing full-sequence is ever resident, so long
    sequences (HunyuanVideo s=9728, d=128) fit VMEM — the resident
    variant holds 3 full-length 128-lane tensors and fails to compile
    there (BASELINE.md 2026-08-19). The price is re-reading q/do/o once
    per kv block, the standard flash-backward tradeoff; below
    `_DKV_RESIDENT_MAX_SEQ` the resident kernel avoids it and stays
    preferred."""
    if has_bias:
        (q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, bias_ref,
         dk_ref, dv_ref) = refs
    else:
        q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dk_ref, dv_ref = refs
        bias_ref = None
    hpb = _heads_per_block(dp)

    @pl.when(pl.program_id(3) == 0)
    def _init():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    kcb = k_ref[0]                                  # [bk, hpb*dp]
    vcb = v_ref[0]
    bk = kcb.shape[0]
    qcb = q_ref[0]                                  # [bq, hpb*dp]
    docb = do_ref[0]
    ocb = o_ref[0]
    bias_col = None
    if bias_ref is not None:
        bias_col = bias_ref[0, 0].reshape(bk, 1)       # [bk, 1]
    for j in range(hpb):
        sl = slice(j * dp, (j + 1) * dp)
        qc, doc, oc = qcb[:, sl], docb[:, sl], ocb[:, sl]
        lse = lse_ref[0, 0, j][None, :]             # [1, bq]
        delta = jnp.sum(doc.astype(jnp.float32)
                        * oc.astype(jnp.float32), axis=1)[None, :]
        st = jax.lax.dot_general(
            kcb[:, sl], qc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale   # [bk, bq]
        if bias_col is not None:
            st = st + bias_col
        pt = jnp.exp(st - lse)                               # [bk, bq]
        dv_ref[0, :, sl] += jax.lax.dot_general(
            pt.astype(doc.dtype), doc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dpt = jax.lax.dot_general(
            vcb[:, sl], doc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [bk, bq]
        dst = (pt * (dpt - delta) * sm_scale).astype(kcb.dtype)
        dk_ref[0, :, sl] += jax.lax.dot_general(
            dst, qc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


# above this many tokens the resident dkv kernel's 3 full-sequence
# 128-lane VMEM tensors (3*s*128*2 B, plus k/v blocks and accumulators)
# stop fitting and the streaming variant takes over (measured boundary:
# s=6144 compiles, HunyuanVideo's s=9728 does not)
_DKV_RESIDENT_MAX_SEQ = 6144


def _bwd(num_heads, sm_scale, block_q, block_k, res, g):
    q, k, v, bias, o, lse = res
    b, sq, inner = q.shape
    skv = k.shape[1]
    dp = inner // num_heads
    hpb = _heads_per_block(dp)
    hg = num_heads // hpb
    lse4 = lse.reshape(b, hg, hpb, sq)
    has_bias = bias is not None

    # dq: parallel over q blocks
    in_specs = [
        pl.BlockSpec((1, block_q, _LANES),
                     lambda bi, h, iq: (bi, iq, h)),                    # q
        pl.BlockSpec((1, skv, _LANES), lambda bi, h, iq: (bi, 0, h)),   # k
        pl.BlockSpec((1, skv, _LANES), lambda bi, h, iq: (bi, 0, h)),   # v
        pl.BlockSpec((1, block_q, _LANES),
                     lambda bi, h, iq: (bi, iq, h)),                    # do
        pl.BlockSpec((1, block_q, _LANES),
                     lambda bi, h, iq: (bi, iq, h)),                    # o
        pl.BlockSpec((1, 1, hpb, block_q),
                     lambda bi, h, iq: (bi, h, 0, iq)),                 # lse
    ]
    args = [q, k, v, g, o, lse4]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, 1, skv), lambda bi, h, iq: (bi, 0, 0)))
        args.append(bias)
    dq_spec = pl.BlockSpec((1, block_q, _LANES),
                           lambda bi, h, iq: (bi, iq, h))
    dq_shape = jax.ShapeDtypeStruct((b, sq, inner), q.dtype)
    _check_specs(in_specs, args, [dq_spec], [dq_shape])
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, block_k=block_k, sm_scale=sm_scale,
                          dp=dp, has_bias=has_bias),
        grid=(b, hg, sq // block_q),
        in_specs=in_specs,
        out_specs=dq_spec,
        out_shape=dq_shape,
        cost_estimate=pl.CostEstimate(
            flops=6 * b * num_heads * sq * skv * dp,
            bytes_accessed=2 * 5 * b * sq * inner,
            transcendentals=b * num_heads * sq * skv,
        ),
        interpret=_interpret(),
    )(*args)

    # dk/dv: parallel over kv blocks; resident q/do/o up to the VMEM
    # boundary, q-streaming (4-D grid + fp32 accumulation across output
    # revisits) beyond it
    if sq <= _DKV_RESIDENT_MAX_SEQ:
        in_specs = [
            pl.BlockSpec((1, sq, _LANES), lambda bi, h, ik: (bi, 0, h)),  # q
            pl.BlockSpec((1, block_k, _LANES),
                         lambda bi, h, ik: (bi, ik, h)),                  # k
            pl.BlockSpec((1, block_k, _LANES),
                         lambda bi, h, ik: (bi, ik, h)),                  # v
            pl.BlockSpec((1, sq, _LANES), lambda bi, h, ik: (bi, 0, h)),  # do
            pl.BlockSpec((1, sq, _LANES), lambda bi, h, ik: (bi, 0, h)),  # o
            pl.BlockSpec((1, 1, hpb, sq), lambda bi, h, ik: (bi, h, 0, 0)),
        ]
        args = [q, k, v, g, o, lse4]
        if has_bias:
            in_specs.append(
                pl.BlockSpec((1, 1, block_k),
                             lambda bi, h, ik: (bi, 0, ik)))
            args.append(bias)
        out_specs = [
            pl.BlockSpec((1, block_k, _LANES),
                         lambda bi, h, ik: (bi, ik, h)),
            pl.BlockSpec((1, block_k, _LANES),
                         lambda bi, h, ik: (bi, ik, h)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, skv, inner), k.dtype),
            jax.ShapeDtypeStruct((b, skv, inner), v.dtype),
        ]
        _check_specs(in_specs, args, out_specs, out_shape)
        dk, dv = pl.pallas_call(
            functools.partial(_dkv_kernel, block_q=block_q,
                              sm_scale=sm_scale,
                              dp=dp, has_bias=has_bias),
            grid=(b, hg, skv // block_k),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            cost_estimate=pl.CostEstimate(
                flops=8 * b * num_heads * sq * skv * dp,
                bytes_accessed=2 * 5 * b * sq * inner,
                transcendentals=b * num_heads * sq * skv,
            ),
            interpret=_interpret(),
        )(*args)
    else:
        in_specs = [
            pl.BlockSpec((1, block_q, _LANES),
                         lambda bi, h, ik, iq: (bi, iq, h)),              # q
            pl.BlockSpec((1, block_k, _LANES),
                         lambda bi, h, ik, iq: (bi, ik, h)),              # k
            pl.BlockSpec((1, block_k, _LANES),
                         lambda bi, h, ik, iq: (bi, ik, h)),              # v
            pl.BlockSpec((1, block_q, _LANES),
                         lambda bi, h, ik, iq: (bi, iq, h)),              # do
            pl.BlockSpec((1, block_q, _LANES),
                         lambda bi, h, ik, iq: (bi, iq, h)),              # o
            pl.BlockSpec((1, 1, hpb, block_q),
                         lambda bi, h, ik, iq: (bi, h, 0, iq)),           # lse
        ]
        args = [q, k, v, g, o, lse4]
        if has_bias:
            in_specs.append(
                pl.BlockSpec((1, 1, block_k),
                             lambda bi, h, ik, iq: (bi, 0, ik)))
            args.append(bias)
        out_specs = [
            pl.BlockSpec((1, block_k, _LANES),
                         lambda bi, h, ik, iq: (bi, ik, h)),
            pl.BlockSpec((1, block_k, _LANES),
                         lambda bi, h, ik, iq: (bi, ik, h)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, skv, inner), jnp.float32),
            jax.ShapeDtypeStruct((b, skv, inner), jnp.float32),
        ]
        _check_specs(in_specs, args, out_specs, out_shape)
        dk32, dv32 = pl.pallas_call(
            functools.partial(_dkv_stream_kernel, sm_scale=sm_scale,
                              dp=dp, has_bias=has_bias),
            grid=(b, hg, skv // block_k, sq // block_q),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            cost_estimate=pl.CostEstimate(
                flops=8 * b * num_heads * sq * skv * dp,
                bytes_accessed=2 * (skv // block_k) * b * sq * inner * 3,
                transcendentals=b * num_heads * sq * skv,
            ),
            interpret=_interpret(),
        )(*args)
        dk, dv = dk32.astype(k.dtype), dv32.astype(v.dtype)
    dbias = jnp.zeros_like(bias) if has_bias else None
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_folded(q, k, v, bias, num_heads, sm_scale, block_q, block_k):
    o, _ = _fwd(q, k, v, bias, num_heads, sm_scale, block_q, block_k)
    return o


def _flash_folded_fwd(q, k, v, bias, num_heads, sm_scale, block_q, block_k):
    o, lse = _fwd(q, k, v, bias, num_heads, sm_scale, block_q, block_k)
    return o, (q, k, v, bias, o, lse)


def _flash_folded_bwd(num_heads, sm_scale, block_q, block_k, res, g):
    return _bwd(num_heads, sm_scale, block_q, block_k, res, g)


_flash_folded.defvjp(_flash_folded_fwd, _flash_folded_bwd)


def flash_attention_folded(
        q: jnp.ndarray,   # [B, Sq, H*dp]
        k: jnp.ndarray,   # [B, Skv, H*dp]
        v: jnp.ndarray,   # [B, Skv, H*dp]
        num_heads: int,
        *,
        sm_scale: float,
        kv_keep: jnp.ndarray | None = None,   # [B, Skv] bool keep mask
        block_q: int = 1024,
        block_k: int = 512,
) -> jnp.ndarray:
    """Flash attention over folded [B, S, H*dp] tensors.

    Caller contract (enforced by ops/attention.py's dispatcher):
    - dp = inner // num_heads divides 128, and num_heads % (128 // dp)
      == 0 (head groups fill a 128-lane block)
    - Sq % block_q == 0 and Skv % block_k == 0 (pad first; padded q
      rows must be zeros)
    - every row keeps >= 1 real kv (kv padding excluded via kv_keep)
    """
    bias = None
    if kv_keep is not None:
        # carried as [B, 1, Skv]: a [B, Skv] array with block (1, skv)
        # violates Mosaic's trailing-two-dims tiling rule whenever B > 1
        # (second-to-last block dim 1 is neither 8-divisible nor equal to
        # B) — it compiled only for B=1 and broke SD3's masked bs2 step
        # on device (bench r4 sd3 rc=1; CPU interpret mode doesn't check)
        bias = jnp.where(kv_keep, 0.0, _NEG_INF).astype(
            jnp.float32)[:, None, :]
    return _flash_folded(q, k, v, bias, num_heads, sm_scale,
                         block_q, block_k)

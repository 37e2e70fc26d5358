"""Single-kernel decode step: ALL decoder layers in one pallas_call.

Round-2 measured decode as per-kernel-overhead bound: ~160 sequential
pallas/XLA dispatches per token at ~0.1-0.15 ms fixed cost each on this
chip (CLAUDE.md).  This module collapses the entire 32-layer stack —
RMSNorms, fused qkv, RoPE, KV quantization, cache attention with the
current-token term computed inline, o/residual, SwiGLU MLP — into ONE
pallas call per token, leaving only embed / lm_head / argmax / 4 cache
column-updates outside (~10 fused XLA ops).

Design rules (probed in tools/perf/bench_megakernel_probe.py):

- Weights stay in their per-layer stacked (L, K/4w, N) serving layout
  (`pack_int8_rows` / `pack_int4_rows`) and are walked IN PLACE: one
  BlockSpec operand per projection (qkv whole; gate and up as two
  ALIASED half-views of the one stored gate_up array; o; down), index
  maps emitting (layer, k-chunk, out-block) as the flat in-layer phase
  counter advances and PARKING on the phase's first tile before it runs
  (a free prefetch) / last tile after (same index -> no refetch).
  Decode therefore shares ONE weight copy with prefill — round 2's flat
  relayouted "tapes" duplicated all decoder weights (+6.7 GB int8 /
  +3.3 GB int4), which set the batch ceiling.  The gu accumulator keeps
  the [g_j | u_j] block layout so SiLU stays block-local; scale_a rows
  are column-interleaved to match (build_tapes).
- Activations cross phases as 3-D VMEM tile stacks (n_chunks, 32, ck)
  indexed on the LEADING axis only — round 2 measured lane-dim
  `pl.dslice` reads of resident scratch serializing Mosaic's pipeline
  (3.7x slower; ops/fused_mlp.py post-mortem).
- Activations quantize to int8 per (row, chunk) at phase boundaries; the
  MXU runs int8 x int8 -> int32 and each accumulation step folds that
  chunk's row scale (serving numerics = QuantDense's W8A8 path).
- Attention reads the packed KV stacks exactly like
  `ops/attention.decode_attention_packed_stack` (keys D-packed (Dh/4, T));
  VALUES use a NEW T-packed layout (T/4, Dh) so the weighted sum is a
  native (1,T)x(T,Dh) MXU matvec instead of a mul+lane-reduce per head.
  The current token's k/v never touch HBM inside the kernel: its
  attention term is computed inline from VMEM and the quantized column is
  emitted as a small output for the (single) XLA cache update outside.

Reference anchor: this is `LlamaBlock`'s decode branch (models/llama.py)
times n_layers; greedy exactness is pinned by tests/tpu checks against
the unfused serving path.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmor_tpu.config import LlamaConfig

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


@dataclass(frozen=True)
class MegaGeometry:
    """Static tiling of the whole-decode-step kernel."""

    n_layers: int
    dim: int
    n_heads: int
    head_dim: int
    ffn: int          # padded ffn width (cfg.ffn_dim + cfg.ffn_pad)
    t_cap: int        # KV cache capacity
    batch: int        # real batch size
    ck: int = 1024    # K-chunk width (activation tile lanes)
    bna: int = 2048   # N-block width, tape A (qkv / gate_up)
    bnb: int = 1024   # N-block width, tape B (o / down)
    g: int = 8        # attention head group (g * head_dim == ck)
    wbits: int = 8    # weight width: 8 (per-channel scales, 4/int32 word)
    #                   or 4 (per-(ck, channel) scales, 8 biased nibbles/word)
    kvbits: int = 8   # KV cache width: 8, or 4 (T-halved biased nibbles)
    bp_extra: int = 0  # extra (32-aligned) activation rows appended after
    #                    the decode rows: they ride every matmul phase on
    #                    the idle MXU but take no attention steps — the
    #                    piggyback-prefill row budget (and its hiding probe)
    pf_chunk: int = 0  # piggyback prefill: chunk columns per step (rows
    #                    [pf_base, bp) carry pf_chunk consecutive prompt
    #                    tokens of ONE stream of the NEXT batch; they ride
    #                    the decode weight stream on the idle MXU and get
    #                    one extra attention step per head against the
    #                    stream's working prefill cache). 0 = plain decode.
    pf_t: int = 0      # prefill working-cache capacity (column count)

    @property
    def ckw(self) -> int:  # tape word-rows per K-chunk
        return self.ck // (8 if self.wbits == 4 else 4)

    @property
    def pf_base(self) -> int:  # first piggyback-prefill activation row
        return self.bp - self.pf_chunk

    @property
    def gpr(self) -> int:  # attention groups per head
        return self.nb8 + (1 if self.pf_chunk else 0)

    @property
    def bp(self) -> int:  # padded batch rows (int8 sublane tile)
        return (max(32, -(-self.batch // 32) * 32) + self.bp_extra
                + self.pf_chunk)

    @property
    def q_width(self) -> int:
        return self.n_heads * self.head_dim

    @property
    def wqkv(self) -> int:
        return 3 * self.q_width  # MHA (n_kv_heads == n_heads)

    @property
    def nkc(self) -> int:  # K-chunks over dim
        return self.dim // self.ck

    @property
    def rg(self) -> int:  # attention batch-row group (8-aligned sublanes)
        # largest 8-multiple divisor of batch (<= bp): fewer, fatter
        # attention steps — the walk is (head x batch/rg) grid steps and
        # each step costs ~2.5 us fixed on this chip, so at b=24 rg=24
        # removes 2k grid steps/token vs rg=8
        for cand in (32, 24, 16, 8):
            if self.batch % cand == 0:
                return cand
        return self.batch

    @property
    def nb8(self) -> int:  # row groups per attention head
        return self.batch // self.rg

    @property
    def nq(self) -> int:  # qkv tile steps
        return (self.wqkv // self.bna) * self.nkc

    @property
    def na(self) -> int:  # attention steps: head-major x 8-row groups
        #                   (+1 piggyback-prefill step per head when on)
        return self.n_heads * self.gpr

    @property
    def no(self) -> int:  # o tile steps
        return (self.dim // self.bnb) * self.nkc

    @property
    def ng(self) -> int:  # gate_up tile steps
        return (2 * self.ffn // self.bna) * self.nkc

    @property
    def nd(self) -> int:  # down tile steps
        return (self.ffn // self.ck) * (self.dim // self.bnb)

    @property
    def steps_per_layer(self) -> int:
        return 1 + self.nq + self.na + self.no + 1 + self.ng + self.nd

    @property
    def a_tiles_per_layer(self) -> int:
        return self.nq + self.ng

    @property
    def b_tiles_per_layer(self) -> int:
        return self.no + self.nd

    @property
    def sa_per_layer(self) -> int:  # scale rows, tape A
        if self.wbits == 4:
            return self.a_tiles_per_layer  # one row per (j, kk) tile
        return self.wqkv // self.bna + 2 * self.ffn // self.bna

    @property
    def sb_per_layer(self) -> int:
        if self.wbits == 4:
            return self.b_tiles_per_layer
        return 2 * (self.dim // self.bnb)

    def validate(self):
        g = self
        assert g.ck % g.head_dim == 0, "chunks must hold whole heads"
        assert g.batch % g.rg == 0
        assert g.dim % g.ck == 0 and g.ffn % g.ck == 0
        assert g.q_width % g.bna == 0, "qkv blocks must not straddle q|k|v"
        assert g.ffn % (g.bna // 2) == 0
        assert g.dim % g.bnb == 0
        assert g.ck % 4 == 0 and g.t_cap % 4 == 0
        assert g.wbits in (8, 4)
        if g.wbits == 4:
            assert g.ck % 8 == 0 and g.ck % 256 == 0, \
                "int4 halves must stay lane-tile aligned"
            # the o phase slices each head from one nibble half: heads
            # must not straddle the ck/2 boundary (hpc even)
            assert (g.ck // g.head_dim) % 2 == 0, \
                "int4 o-phase needs 2*head_dim <= ck (whole heads per nibble half)"
        assert g.kvbits in (8, 4)
        if g.kvbits == 4:
            assert g.t_cap % 8 == 0, "T-halved nibble packing needs T % 8"
            # ON CHIP the kernel additionally needs t_cap % 256: attention
            # weights slice at T/2 and Mosaic rejects sub-lane-tile slice
            # boundaries ("unsupported shape cast", probed round 5).
            # Interpret-mode tests run smaller T, so serving entry points
            # enforce it (inference._cache_len_for granule 256).
        assert g.bp_extra % 32 == 0 and g.bp_extra >= 0
        if g.pf_chunk:
            assert g.pf_chunk % 32 == 0, "chunk rows must tile sublanes"
            if g.kvbits == 4:
                assert g.pf_t % 256 == 0, \
                    "prefill cache needs lane-tiled T-halves (T2/2 % 128)"
                assert (g.pf_t // 2) % g.pf_chunk == 0, (
                    "chunk slabs must not straddle the T-halved nibble "
                    "boundary", g.pf_t, g.pf_chunk)
            else:
                assert g.pf_t % 128 == 0 and g.pf_t % g.pf_chunk == 0
        assert g.bna % g.head_dim == 0 and g.head_dim % 4 == 0
        assert g.n_heads % g.g == 0
        # gate_up blocks are [g_j | u_j]; the SiLU half feeds the down
        # phase's (bp, ck) activation chunks directly
        assert g.bna == 2 * g.ck, "tape-A blocks must be two ck halves"
        # o/down finishes write whole (bp, ck) residual chunks
        assert g.bnb == g.ck, "tape-B blocks must match the chunk width"

    @classmethod
    def pick_ck(cls, cfg: LlamaConfig) -> int:
        """The K-chunk width from_config auto-selects for ``cfg`` — also
        the int4 scale group serving setups must quantize with."""
        dh = cfg.head_dim
        dim = cfg.dim
        ffn = cfg.ffn_dim + cfg.ffn_pad
        qw = cfg.n_heads * dh
        for cand in (1024, 512, 256, 128, 64, 32, 16):
            if (cand % dh == 0 and dim % cand == 0 and ffn % cand == 0
                    and cfg.n_heads % max(1, cand // dh) == 0
                    and qw % (2 * cand) == 0):
                return cand
        raise ValueError(f"no legal K-chunk for dim={dim} ffn={ffn} dh={dh}")

    @classmethod
    def from_config(cls, cfg: LlamaConfig, batch: int, t_cap: int,
                    **kw) -> "MegaGeometry":
        assert cfg.n_kv_heads == cfg.n_heads, "megakernel assumes MHA"
        kw.setdefault("wbits", cfg.weight_bits)
        kw.setdefault("kvbits", cfg.kv_bits)
        dh = cfg.head_dim
        if "ck" not in kw:  # auto-tile for small/test configs; bna = 2*ck
            kw["ck"] = cls.pick_ck(cfg)
        if "g" not in kw:
            kw["g"] = kw["ck"] // dh
        if "bna" not in kw:
            kw["bna"] = 2 * kw["ck"]  # [g_j | u_j] pairing fixes bna
        if "bnb" not in kw:
            kw["bnb"] = kw["ck"]  # residual-chunk writes fix bnb
        geo = cls(
            n_layers=cfg.n_layers, dim=cfg.dim, n_heads=cfg.n_heads,
            head_dim=dh, ffn=cfg.ffn_dim + cfg.ffn_pad, t_cap=t_cap,
            batch=batch, **kw)
        geo.validate()
        if geo.wbits == 4:
            assert cfg.weight_group == geo.ck, (
                "int4 scale group must equal the kernel K-chunk",
                cfg.weight_group, geo.ck)
        return geo


# ------------------------------------------------------------------ #
# weight tapes
# ------------------------------------------------------------------ #


def _interleave_cols(x: jax.Array, ffn: int, half: int) -> jax.Array:
    """Permute fused [gate | up] columns into per-block pairs
    [g_0 | u_0 | g_1 | u_1 | ...] with each chunk ``half`` wide — the
    kernel's gu-accumulator layout. Applies row-wise to any leading dims
    (packed weight rows or per-channel/per-group scale rows alike)."""
    lead = x.shape[:-1]
    assert x.shape[-1] == 2 * ffn and ffn % half == 0
    nb = ffn // half
    g = x[..., :ffn].reshape(*lead, nb, half)
    u = x[..., ffn:].reshape(*lead, nb, half)
    return jnp.stack([g, u], axis=-2).reshape(*lead, 2 * ffn)


def interleave_gate_up(w_p: jax.Array, scale: jax.Array, ffn: int,
                       half: int) -> tuple[jax.Array, jax.Array]:
    """_interleave_cols on a packed weight + its scale (testing/reference
    helper; the serving path stores gate_up PLAIN and the kernel reads the
    gate and up halves as two aliased BlockSpec operands)."""
    return (_interleave_cols(w_p, ffn, half),
            _interleave_cols(scale, ffn, half))


def build_tapes(blocks: dict, geo: MegaGeometry) -> dict:
    """Quantized `blocks` tree (stacked (L, K/4w, N) `w_p` + `scale` for
    qkv_proj / o_proj / gate_up_proj / down_proj) -> kernel operands.

    The BIG weight arrays pass through BY REFERENCE — zero copies. The
    kernel's BlockSpec index maps walk the per-layer stacked (L, Kp, N)
    layout directly (qkv/o/down whole, gate_up as two aliased gate/up
    half-operands), so serving holds ONE copy of the decoder weights,
    shared with the prefill path (round-2 duplicated them into flat
    tapes: +6.7 GB int8 / +3.3 GB int4 — the batch ceiling).

    Only the SMALL per-step scale rows and the norm rows are relayouted:
    scale_a holds one (1, bna) row per A step (qkv rows, then gate_up
    rows with [sg_j | su_j] column interleave matching the accumulator
    layout); scale_b the same for o / down. int4 scales are
    per-(K-chunk, channel): one row per (j, kk) TILE in walk order.

    Call EAGERLY (not under jit): jit would copy the pass-through weight
    arrays into fresh output buffers, recreating the duplicate.
    """
    l = geo.n_layers

    def tile_scales(scale, bn):
        # (K/ck, N) -> (nj*nk, bn) rows in tile order t = j*nk + kk
        nk, n = scale.shape
        nj = n // bn
        return (scale.reshape(nk, nj, bn).transpose(1, 0, 2)
                .reshape(nj * nk, bn))

    gu_s = jax.vmap(functools.partial(
        _interleave_cols, ffn=geo.ffn, half=geo.bna // 2)
    )(blocks["gate_up_proj"]["scale"])
    a_scales, b_scales = [], []
    for li in range(l):
        if geo.wbits == 4:
            a_scales.append(tile_scales(blocks["qkv_proj"]["scale"][li],
                                        geo.bna))
            a_scales.append(tile_scales(gu_s[li], geo.bna))
            b_scales.append(tile_scales(blocks["o_proj"]["scale"][li],
                                        geo.bnb))
            b_scales.append(tile_scales(blocks["down_proj"]["scale"][li],
                                        geo.bnb))
        else:
            a_scales.append(blocks["qkv_proj"]["scale"][li].reshape(-1, geo.bna))
            a_scales.append(gu_s[li].reshape(-1, geo.bna))
            b_scales.append(blocks["o_proj"]["scale"][li].reshape(-1, geo.bnb))
            b_scales.append(blocks["down_proj"]["scale"][li].reshape(-1, geo.bnb))
    norms = jnp.stack(
        [blocks["attn_norm"]["scale"], blocks["mlp_norm"]["scale"]], axis=1
    ).astype(jnp.float32)  # (L, 2, dim)
    return dict(
        qkv_wp=blocks["qkv_proj"]["w_p"],
        gu_wp=blocks["gate_up_proj"]["w_p"],
        o_wp=blocks["o_proj"]["w_p"],
        dn_wp=blocks["down_proj"]["w_p"],
        scale_a=jnp.concatenate(a_scales, axis=0).astype(jnp.float32)[:, None, :],
        scale_b=jnp.concatenate(b_scales, axis=0).astype(jnp.float32)[:, None, :],
        norms=norms.reshape(l * 2, geo.nkc, geo.ck),
    )


def untile_tapes(tapes: dict, geo: MegaGeometry) -> dict:
    """Recover per-projection packed weights + scales from the kernel
    operands (testing / XLA reference). Weights come back per-layer
    stacked (L, K/4w, N) — with gate_up column-INTERLEAVED into the
    kernel's [g_j | u_j] accumulator layout, built here from the plain
    stored array. Scales come back per-channel (L, N) for wbits=8 and
    per-chunk (L, K/ck, N) for wbits=4."""
    out = {}
    sa = tapes["scale_a"].reshape(geo.n_layers, geo.sa_per_layer, geo.bna)
    sb = tapes["scale_b"].reshape(geo.n_layers, geo.sb_per_layer, geo.bnb)

    def unscale(s, nj, nk, bn):
        if geo.wbits == 4:
            # (nj*nk, bn) tile rows -> (K/ck, N)
            return (s.reshape(nj, nk, bn).transpose(1, 0, 2)
                     .reshape(nk, nj * bn))
        return s.reshape(-1)

    nqb = geo.wqkv // geo.bna
    ngb = 2 * geo.ffn // geo.bna
    saq = geo.nq if geo.wbits == 4 else nqb
    gu_w = jax.vmap(functools.partial(
        _interleave_cols, ffn=geo.ffn, half=geo.bna // 2))(tapes["gu_wp"])
    out["qkv_proj"] = (
        tapes["qkv_wp"],
        jax.vmap(lambda s: unscale(s[:saq], nqb, geo.nkc, geo.bna))(sa),
    )
    out["gate_up_interleaved"] = (
        gu_w,
        jax.vmap(lambda s: unscale(s[saq:], ngb, geo.nkc, geo.bna))(sa),
    )
    nob = geo.dim // geo.bnb
    ndk = geo.ffn // geo.ck
    sbo = geo.no if geo.wbits == 4 else nob
    out["o_proj"] = (
        tapes["o_wp"],
        jax.vmap(lambda s: unscale(s[:sbo], nob, geo.nkc, geo.bnb))(sb),
    )
    out["down_proj"] = (
        tapes["dn_wp"],
        jax.vmap(lambda s: unscale(s[sbo:], nob, ndk, geo.bnb))(sb),
    )
    return out


# ------------------------------------------------------------------ #
# T-packed V cache (values as (T/4, Dh) int32 so attention's weighted sum
# is a native (1, T) x (T, Dh) MXU matvec)
# ------------------------------------------------------------------ #


def pack_v_tmajor(v_q: jax.Array) -> jax.Array:
    """int8 (..., T, D) -> int32 (..., T/4, D): word r packs positions
    {4r..4r+3}; ``pltpu.bitcast(-> int8)`` restores (..., T, D) row-order."""
    *lead, t, d = v_q.shape
    x = v_q.reshape(*lead, t // 4, 4, d).astype(jnp.int32) & 0xFF
    return (x[..., 0, :] | (x[..., 1, :] << 8)
            | (x[..., 2, :] << 16) | (x[..., 3, :] << 24))


def unpack_v_tmajor(v_p: jax.Array) -> jax.Array:
    """Inverse of pack_v_tmajor in plain XLA."""
    *lead, t4, d = v_p.shape
    parts = [((v_p << (24 - 8 * b)) >> 24).astype(jnp.int8) for b in range(4)]
    return jnp.stack(parts, axis=-2).reshape(*lead, t4 * 4, d)


def quantize_kv_tmajor(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., T, D) float -> (T-packed int32 (..., T/4, D), scales (..., T)
    bf16). Same per-position symmetric int8 quantization as
    models/llama.quantize_kv, different packing axis."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return pack_v_tmajor(q), scale[..., 0].astype(jnp.bfloat16)


# ------------------------------------------------------------------ #
# int4 KV cache: nibbles pack T-HALVED (lo nibble = position t, hi =
# t + T/2) so decode's attention dots split into two lane-aligned T/2
# halves with the head dim intact; the +8 bias (non-negative nibbles,
# like pack_int4_rows) folds into rank-1 qsum/wsum corrections.
# ------------------------------------------------------------------ #


def _quantize_int4_pos(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., T, D) -> (biased nibble values int8 in [1, 15], bf16 scales
    (..., T)) — per-position symmetric int4."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -7, 7)
    return (q + 8).astype(jnp.int8), scale[..., 0].astype(jnp.bfloat16)


def pack_k_int4(u: jax.Array) -> jax.Array:
    """Biased nibbles (..., T, D) -> D-packed T-halved int32 (..., D/4, T/2).
    Word (r, t) byte b holds dh index 4r+b at position t (lo nibble) and
    position t + T/2 (hi nibble)."""
    *lead, t, d = u.shape
    half = t // 2
    ut = u.swapaxes(-1, -2)  # (..., D, T)
    lo = ut[..., :half].reshape(*lead, d // 4, 4, half).astype(jnp.int32)
    hi = ut[..., half:].reshape(*lead, d // 4, 4, half).astype(jnp.int32)
    b = (lo & 0xF) | ((hi & 0xF) << 4)  # nibble pair per byte
    return (b[..., 0, :] | (b[..., 1, :] << 8) | (b[..., 2, :] << 16)
            | (b[..., 3, :] << 24))


def pack_v_int4(u: jax.Array) -> jax.Array:
    """Biased nibbles (..., T, D) -> T-packed T-halved int32 (..., T/8, D).
    Word (r, d) byte b holds position 4r+b of the FIRST T-half (lo nibble)
    and of the second half (hi nibble)."""
    *lead, t, d = u.shape
    half = t // 2
    lo = u[..., :half, :].reshape(*lead, half // 4, 4, d).astype(jnp.int32)
    hi = u[..., half:, :].reshape(*lead, half // 4, 4, d).astype(jnp.int32)
    b = (lo & 0xF) | ((hi & 0xF) << 4)
    return (b[..., 0, :] | (b[..., 1, :] << 8) | (b[..., 2, :] << 16)
            | (b[..., 3, :] << 24))


def quantize_k_int4(k: jax.Array, t_cap: int | None = None
                    ) -> tuple[jax.Array, jax.Array]:
    """(..., T, D) float K -> (D-packed T-halved int32 (..., D/4, Tc/2),
    scales (..., T) bf16); pads positions to ``t_cap`` in the int domain
    first (nibble pairing spans the capacity halves). Padded positions
    hold nibble 0 — garbage values the kv_mask excludes."""
    u, scale = _quantize_int4_pos(k)
    if t_cap is not None and t_cap != u.shape[-2]:
        pad = [(0, 0)] * (u.ndim - 2) + [(0, t_cap - u.shape[-2]), (0, 0)]
        u = jnp.pad(u, pad)
    return pack_k_int4(u), scale


def quantize_v_int4(v: jax.Array, t_cap: int | None = None
                    ) -> tuple[jax.Array, jax.Array]:
    """(..., T, D) float V -> (T-packed T-halved int32 (..., Tc/8, D),
    scales (..., T) bf16); capacity padding as quantize_k_int4."""
    u, scale = _quantize_int4_pos(v)
    if t_cap is not None and t_cap != u.shape[-2]:
        pad = [(0, 0)] * (u.ndim - 2) + [(0, t_cap - u.shape[-2]), (0, 0)]
        u = jnp.pad(u, pad)
    return pack_v_int4(u), scale


def unpack_k_int4(kp: jax.Array, t: int) -> jax.Array:
    """Inverse of quantize_k_int4's packing -> int values (..., T, D)."""
    *lead, d4, half = kp.shape
    assert t == 2 * half, ("t must match the packed T-halved layout", t)
    parts = []
    for nib in (kp & 0x0F0F0F0F, (kp >> 4) & 0x0F0F0F0F):
        bs = [((nib >> (8 * b)) & 0xFF).astype(jnp.int8) for b in range(4)]
        parts.append(jnp.stack(bs, axis=-2).reshape(*lead, d4 * 4, half))
    u = jnp.concatenate(parts, axis=-1)  # (..., D, T)
    return (u.swapaxes(-1, -2).astype(jnp.int32) - 8).astype(jnp.int8)


def unpack_v_int4(vp: jax.Array, t: int) -> jax.Array:
    """Inverse of quantize_v_int4's packing -> int values (..., T, D)."""
    *lead, t8, d = vp.shape
    assert t == 8 * t8, ("t must match the packed T-halved layout", t)
    parts = []
    for nib in (vp & 0x0F0F0F0F, (vp >> 4) & 0x0F0F0F0F):
        bs = [((nib >> (8 * b)) & 0xFF).astype(jnp.int8) for b in range(4)]
        parts.append(jnp.stack(bs, axis=-2).reshape(*lead, t8 * 4, d))
    u = jnp.concatenate(parts, axis=-2)  # (..., T, D)
    return (u.astype(jnp.int32) - 8).astype(jnp.int8)


# ------------------------------------------------------------------ #
# the kernel
# ------------------------------------------------------------------ #


def _mega_kernel(
    # inputs
    x_in_ref,      # (nxc, bp, ck) bf16
    cos_ref,       # (1, bp, bna/dh, dh) f32  rope tables, head-shaped
    sin_ref,       # (1, bp, bna/dh, dh) f32
    sign_ref,      # (1, 1, 1, dh) f32   rotate_half sign row (-1,+1 halves)
    mask_ref,      # (bp, T) int32
    norm_ref,      # (1, nxc, ck) f32    [l*2 + phase]
    qkvw_ref,      # (1, ckw, bna) int32  [l, kk, j] of the stacked w_p
    gug_ref,       # (1, ckw, ck) int32   gate half (aliases the gu array)
    guu_ref,       # (1, ckw, ck) int32   up half   (same array, +ffn cols)
    scale_a_ref,   # (1, 1, bna) f32
    ow_ref,        # (1, ckw, bnb) int32
    dnw_ref,       # (1, ckw, bnb) int32
    scale_b_ref,   # (1, 1, bnb) f32
    kq_ref,        # (1, rg, 1, dh/4, T) int32   [l, row-group, head]
    ks_ref,        # (1, 1, rg, T) bf16   scales live (L,H,B,T)
    vq_ref,        # (1, rg, 1, T/4, dh) int32
    vs_ref,        # (1, 1, rg, T) bf16
    # piggyback-prefill inputs (geo.pf_chunk > 0 only):
    #   kq2 (1, 1, dh/4, T2[/2]) int32  [l, head] one stream's working cache
    #   ks2 (1, 1, T2) bf16 | vq2 (1, 1, T2/4[8], dh) int32 | vs2 (1,1,T2)
    #   pfmask (1, T2) int32 (columns < wp and real) | pfamask (1, c) int32
    # outputs:
    #   x_out (1, bp, ck) bf16 [j] | knew (1, bp, bna) int8 [l*nkb+(j-qb)]
    #   knew_s (1, bp, bna/dh) f32 | vnew | vnew_s
    # optional debug-dump outputs (debug_dump != ""), then scratch:
    # xs (nxc,bp,ck) f32 | x2s | hq int8 | hrs | qatt (H,bp,dh) int8 | qs |
    # kcur f32 | vcur f32 | a8 int8 | ars | m8 (ffn/ck,bp,ck) int8 | mrs |
    # acc (bp,bna) f32
    *rest,
    geo: MegaGeometry,
    eps: float,
    sm_scale: float,
    debug_phases: str = "full",
    debug_dump: str = "",
):
    if geo.pf_chunk:
        (kq2_ref, ks2_ref, vq2_ref, vs2_ref, pfmask_ref, pfamask_ref
         ) = rest[:6]
        rest = rest[6:]
    (x_out_ref, knew_ref, knew_s_ref, vnew_ref, vnew_s_ref) = rest[:5]
    rest = rest[5:]
    if debug_dump:
        dump8_ref, dumps_ref = rest[0], rest[1]
        rest = rest[2:]
    (xs_ref, x2s_ref, hq_ref, hrs_ref, qatt_ref, qs_ref, kcur_ref,
     vcur_ref, a8_ref, ars_ref, m8_ref, mrs_ref, acc_ref) = rest
    # debug_phases: comma/plus set of {a, afin, att, b} or "full" —
    # compile-time bisection knob (Mosaic compile cost hunting); production
    # always runs "full".
    _on = (lambda name: name != "aflite") if debug_phases == "full" else (
        lambda name: name in debug_phases)
    g = geo
    l = pl.program_id(0)
    s = pl.program_id(1)
    nkc, ck, bna, bnb, dh = g.nkc, g.ck, g.bna, g.bnb, g.head_dim
    f32 = jnp.float32

    qkv0 = 1
    att0 = qkv0 + g.nq
    o0 = att0 + g.na
    n2 = o0 + g.no
    gu0 = n2 + 1
    dn0 = gu0 + g.ng
    qb = g.q_width // g.bna          # q blocks in qkv phase
    kb = qb + g.q_width // g.bna     # first v block
    heads_per_blk = bna // dh

    def quant_rows(x):
        """f32 (..., rows, lanes) -> (int8, f32 scales (..., rows, 1))."""
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        rs = jnp.where(amax > 0, amax / 127.0, 1.0)
        q = jnp.clip(jnp.round(x * (1.0 / rs)), -127, 127).astype(jnp.int8)
        return q, rs

    def dot8(x8, w8):
        return jax.lax.dot_general(
            x8, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(f32)

    def nibble_halves(tape_ref):
        """int4 tape block (1, ck/8, bn) -> two (ck/2, bn) int8 halves of
        BIASED nibbles (u = q+8, non-negative); mask+shift+bitcast only —
        the -8 bias folds into the dot as -8*rowsum(x) (pack_int4_rows)."""
        w32 = tape_ref[...]
        lo = pltpu.bitcast(w32 & 0x0F0F0F0F, jnp.int8)[0]
        hi = pltpu.bitcast((w32 >> 4) & 0x0F0F0F0F, jnp.int8)[0]
        return lo, hi

    def dot4(x8, lo, hi):
        """x8 (bp, ck) int8 vs biased-nibble halves -> f32 (bp, bn),
        bias-corrected."""
        h2 = x8.shape[1] // 2
        part = dot8(x8[:, :h2], lo) + dot8(x8[:, h2:], hi)
        rowsum = jnp.sum(x8.astype(f32), axis=1, keepdims=True)
        return part - 8.0 * rowsum

    # ---------------- norm steps (attn_norm at s==0, mlp_norm at s==n2)
    def norm_step(src_ref):
        x = src_ref[...]  # (nxc, bp, ck) f32
        var = jnp.sum(x * x, axis=(0, 2), keepdims=True) / g.dim
        h = x * jax.lax.rsqrt(var + eps) * norm_ref[0][:, None, :]
        q8, rs = quant_rows(h)
        hq_ref[...] = q8
        hrs_ref[...] = rs

    @pl.when(jnp.logical_and(s == 0, l == 0))
    def _():
        xs_ref[...] = x_in_ref[...].astype(f32)

    @pl.when(s == 0)
    def _():
        norm_step(xs_ref)

    @pl.when(s == n2)
    def _():
        norm_step(x2s_ref)

    # ---------------- tape-A matmul phases (qkv, gate_up)
    in_qkv = jnp.logical_and(s >= qkv0, s < att0)
    in_gu = jnp.logical_and(s >= gu0, s < dn0)
    ta = jnp.where(in_gu, s - gu0, jnp.clip(s - qkv0, 0, g.nq - 1))
    j_a = ta // nkc
    kk_a = ta % nkc
    in_a = jnp.logical_or(in_qkv, in_gu)

    if _on("a"):
        @pl.when(jnp.logical_and(in_a, kk_a == 0))
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        @pl.when(in_qkv)
        def _():
            if g.wbits == 4:
                lo, hi = nibble_halves(qkvw_ref)
                # per-(chunk, channel) weight scale folds in per step; the
                # finish then skips the per-block rescale
                acc_ref[...] += (dot4(hq_ref[kk_a], lo, hi)
                                 * scale_a_ref[0]) * hrs_ref[kk_a]
            else:
                w8 = pltpu.bitcast(qkvw_ref[...], jnp.int8)[0]  # (ck, bna)
                acc_ref[...] += dot8(hq_ref[kk_a], w8) * hrs_ref[kk_a]

        @pl.when(in_gu)
        def _():
            # gate and up arrive as two ck-wide aliased views; the
            # accumulator keeps the [g_j | u_j] block layout the SiLU
            # finish expects (scale_a rows are column-interleaved to match)
            if g.wbits == 4:
                glo, ghi = nibble_halves(gug_ref)
                ulo, uhi = nibble_halves(guu_ref)
                acc_ref[:, :ck] += (dot4(hq_ref[kk_a], glo, ghi)
                                    * scale_a_ref[0][:, :ck]) * hrs_ref[kk_a]
                acc_ref[:, ck:] += (dot4(hq_ref[kk_a], ulo, uhi)
                                    * scale_a_ref[0][:, ck:]) * hrs_ref[kk_a]
            else:
                g8 = pltpu.bitcast(gug_ref[...], jnp.int8)[0]  # (ck, ck)
                u8 = pltpu.bitcast(guu_ref[...], jnp.int8)[0]
                acc_ref[:, :ck] += dot8(hq_ref[kk_a], g8) * hrs_ref[kk_a]
                acc_ref[:, ck:] += dot8(hq_ref[kk_a], u8) * hrs_ref[kk_a]

    fin_a = jnp.logical_and(in_a, kk_a == nkc - 1)

    # -- qkv finish: rope, stash q/kcur/vcur, emit quantized new-KV column.
    # One SHARED rope+quantize computation with selects; the q/k/v branches
    # are stores only — Mosaic fully unrolls every branch body to vreg ops,
    # so duplicated heavy compute tripled the kernel program (compile-time
    # hazard measured on this chip's AOT service).
    if _on("aflite"):  # compile-cost probe: finish branch minus rope/quant
        @pl.when(jnp.logical_and(fin_a, in_qkv))
        def _():
            out = (acc_ref[...] * scale_a_ref[0]).reshape(
                g.bp, heads_per_blk, dh)
            q8x = out.astype(jnp.int8)
            knew_ref[0] = q8x

            @pl.when(j_a < qb)
            def _():
                for hh in range(heads_per_blk):
                    qatt_ref[j_a * heads_per_blk + hh] = q8x[:, hh, :]

    if _on("afin"):
        @pl.when(jnp.logical_and(fin_a, in_qkv))
        def _():
            accv = (acc_ref[...] if g.wbits == 4
                    else acc_ref[...] * scale_a_ref[0])
            out = accv.reshape(
                g.bp, heads_per_blk, dh)          # (bp, heads, dh) f32
            # HF rotate_half entirely inside each head's 128 lanes: a roll
            # by dh/2 on the LAST axis wraps within the head, and a constant
            # sign row (-1 x dh/2, +1 x dh/2) fixes the sign — no iota, no
            # select, one layout-changing op (Mosaic's layout solver chokes
            # on roll+iota+select chains; measured 28-min compiles).
            rot = pltpu.roll(out, dh // 2, axis=2) * sign_ref[0]
            roped = out * cos_ref[0] + rot * sin_ref[0]
            is_q = j_a < qb
            is_k = jnp.logical_and(j_a >= qb, j_a < kb)
            base = jnp.where(j_a >= kb, out, roped)      # v: no rope
            base = jnp.where(is_q, base * sm_scale, base)
            q8, rs = quant_rows(base)                    # 3-D, native layout
            deq3 = q8.astype(f32) * rs  # f32: requant bins are exact
            srow = rs[..., 0]                            # (bp, heads)

            @pl.when(is_q)
            def _():
                for hh in range(heads_per_blk):
                    qatt_ref[j_a * heads_per_blk + hh] = q8[:, hh, :]
                    qs_ref[j_a * heads_per_blk + hh] = rs[:, hh, :]

            @pl.when(is_k)
            def _():
                knew_ref[0] = q8
                knew_s_ref[0] = srow
                for hh in range(heads_per_blk):
                    kcur_ref[(j_a - qb) * heads_per_blk + hh] = deq3[:, hh, :]

            @pl.when(j_a >= kb)
            def _():
                vnew_ref[0] = q8
                vnew_s_ref[0] = srow
                for hh in range(heads_per_blk):
                    vcur_ref[(j_a - kb) * heads_per_blk + hh] = deq3[:, hh, :]

    # -- gate_up finish: block-local SiLU (block layout [g_j | u_j])
    if _on("afin"):
        @pl.when(jnp.logical_and(fin_a, in_gu))
        def _():
            gu = (acc_ref[...] if g.wbits == 4
                  else acc_ref[...] * scale_a_ref[0])
            half = bna // 2
            gate = gu[:, :half]
            up = gu[:, half:]
            m = (gate * jax.nn.sigmoid(gate)) * up  # (bp, bna/2 == ck)
            q8, rs = quant_rows(m)
            m8_ref[j_a] = q8
            mrs_ref[j_a] = rs

    # ---------------- attention: one step per (head, 8-row batch group).
    # All scratch accesses are leading-index or 8-aligned sublane slices
    # (Mosaic rejects unaligned dynamic sublane rows); the KV cache blocks
    # gather 8 batch rows of one head via strided BlockSpec windows.
    in_att = jnp.logical_and(s >= att0, s < o0)
    a_i = jnp.clip(s - att0, 0, g.na - 1)
    h_i = a_i // g.gpr
    g_i = a_i % g.gpr
    i8_i = jnp.minimum(g_i, g.nb8 - 1)
    rg = g.rg

    if _on("att"):
        @pl.when(jnp.logical_and(in_att, g_i < g.nb8))
        def _():
            r0 = pl.multiple_of(i8_i * rg, rg)
            q8 = qatt_ref[h_i, pl.dslice(r0, rg), :]            # (rg, dh) i8
            qsx = qs_ref[h_i, pl.dslice(r0, rg), :].astype(f32)  # (rg, 1)
            kc = kcur_ref[h_i, pl.dslice(r0, rg), :].astype(f32)
            vc = vcur_ref[h_i, pl.dslice(r0, rg), :].astype(f32)
            mrow = mask_ref[pl.dslice(r0, rg), :]               # (rg, T)
            ksx = ks_ref[0, 0].astype(f32)                      # (rg, T)
            vsx = vs_ref[0, 0].astype(f32)
            # batched matvecs over the rg rows; lhs keeps a unit
            # non-contracting dim (a fully-degenerate lhs trips Mosaic's
            # dot_dimension_numbers printer)
            bdims = (((2,), (1,)), ((0,), (0,)))
            half_t = g.t_cap // 2
            if g.kvbits == 4:
                # T-halved biased nibbles: two lane-aligned T/2 dots +
                # a rank-1 -8*qsum bias correction (quantize_k_int4)
                kw = kq_ref[0, :, 0]                    # (rg, dh/4, T/2)
                klo = pltpu.bitcast(kw & 0x0F0F0F0F, jnp.int8)
                khi = pltpu.bitcast((kw >> 4) & 0x0F0F0F0F, jnp.int8)
                q3 = q8[:, None, :]
                llo = jax.lax.dot_general(
                    q3, klo, bdims, preferred_element_type=jnp.int32)[:, 0]
                lhi = jax.lax.dot_general(
                    q3, khi, bdims, preferred_element_type=jnp.int32)[:, 0]
                qsum = jnp.sum(q8.astype(f32), axis=1, keepdims=True)
                logits = (jnp.concatenate([llo, lhi], axis=1).astype(f32)
                          - 8.0 * qsum)
            else:
                k8 = pltpu.bitcast(kq_ref[0, :, 0], jnp.int8)   # (rg, dh, T)
                logits = jax.lax.dot_general(
                    q8[:, None, :], k8, bdims,
                    preferred_element_type=jnp.int32)[:, 0].astype(f32)
            logits = logits * qsx * ksx
            logits = jnp.where(mrow != 0, logits, NEG_INF)
            lcur = jnp.sum(q8.astype(f32) * kc, axis=1,
                           keepdims=True) * qsx                  # (rg, 1)
            mmax = jnp.maximum(jnp.max(logits, 1, keepdims=True), lcur)
            w = jnp.exp(logits - mmax)
            wc = jnp.exp(lcur - mmax)
            denom = jnp.sum(w, 1, keepdims=True) + wc
            w8, wrs = quant_rows(w * vsx)
            if g.kvbits == 4:
                vw = vq_ref[0, :, 0]                    # (rg, T/8, dh)
                vlo = pltpu.bitcast(vw & 0x0F0F0F0F, jnp.int8)
                vhi = pltpu.bitcast((vw >> 4) & 0x0F0F0F0F, jnp.int8)
                # slice-then-expand: the fused `w8[:, None, :half_t]`
                # form lowers through rewriting_take -> gather, which
                # Mosaic's gather rule rejects (shape-mismatch at compile;
                # interpret mode hid it). slice_in_dim + [:, None, :]
                # stays on the lax.slice/broadcast path the int8 arm uses.
                w8lo = jax.lax.slice_in_dim(w8, 0, half_t, axis=1)
                w8hi = jax.lax.slice_in_dim(w8, half_t, g.t_cap, axis=1)
                ov = (jax.lax.dot_general(
                        w8lo[:, None, :], vlo, bdims,
                        preferred_element_type=jnp.int32)
                      + jax.lax.dot_general(
                        w8hi[:, None, :], vhi, bdims,
                        preferred_element_type=jnp.int32))[:, 0].astype(f32)
                wsum = jnp.sum(w8.astype(f32), axis=1, keepdims=True)
                ov = (ov - 8.0 * wsum) * wrs             # (rg, dh)
            else:
                v8 = pltpu.bitcast(vq_ref[0, :, 0], jnp.int8)   # (rg, T, dh)
                ov = jax.lax.dot_general(
                    w8[:, None, :], v8, bdims,
                    preferred_element_type=jnp.int32
                )[:, 0].astype(f32) * wrs                        # (rg, dh)
            rows = (ov + wc * vc) / denom
            r8, rrs = quant_rows(rows)
            a8_ref[h_i, pl.dslice(r0, rg), :] = r8
            ars_ref[h_i, pl.dslice(r0, rg), :] = rrs

    # -- piggyback-prefill attention: one step per head. The chunk rows are
    # pf_chunk CONSECUTIVE prompt tokens of ONE stream of the NEXT batch:
    # plain (c, dh) x (dh, T2) matmuls against the stream's working cache
    # (already-written columns, masked to < wp by pfmask) plus an inline
    # causal (c, c) block from the VMEM-resident chunk k/v — the in-kernel
    # equivalent of chunked prefill attention riding the decode weight walk.
    if _on("pfatt") and g.pf_chunk:
        @pl.when(jnp.logical_and(in_att, g_i == g.nb8))
        def _():
            c = g.pf_chunk
            pb = g.pf_base
            t2 = g.pf_t
            q8 = qatt_ref[h_i, pb:pb + c, :]                # (c, dh) i8
            qsx = qs_ref[h_i, pb:pb + c, :].astype(f32)     # (c, 1)
            kc = kcur_ref[h_i, pb:pb + c, :].astype(f32)    # (c, dh)
            vc = vcur_ref[h_i, pb:pb + c, :].astype(f32)
            mrow = pfmask_ref[0]                            # (1, T2)
            ksx = ks2_ref[0].astype(f32)                    # (1, T2)
            vsx = vs2_ref[0].astype(f32)
            if g.kvbits == 4:
                kw = kq2_ref[0, 0]                          # (dh/4, T2/2)
                klo = pltpu.bitcast(kw & 0x0F0F0F0F, jnp.int8)
                khi = pltpu.bitcast((kw >> 4) & 0x0F0F0F0F, jnp.int8)
                qsum = jnp.sum(q8.astype(f32), axis=1, keepdims=True)
                logits = (jnp.concatenate(
                    [dot8(q8, klo), dot8(q8, khi)], axis=1) - 8.0 * qsum)
            else:
                k8 = pltpu.bitcast(kq2_ref[0, 0], jnp.int8)  # (dh, T2)
                logits = dot8(q8, k8)
            logits = logits * qsx * ksx
            logits = jnp.where(mrow != 0, logits, NEG_INF)
            # intra-chunk causal block (chunk k is exact f32 in VMEM); the
            # causal&pad mask arrives precomputed — in-kernel iota+select
            # chains are a known Mosaic layout-solver compile-time hazard
            li = jax.lax.dot_general(
                q8.astype(f32), kc, (((1,), (1,)), ((), ()))) * qsx
            li = jnp.where(pfamask_ref[0] != 0, li, NEG_INF)
            m = jnp.maximum(jnp.max(logits, 1, keepdims=True),
                            jnp.max(li, 1, keepdims=True))
            w = jnp.exp(logits - m)
            wi = jnp.exp(li - m)
            denom = (jnp.sum(w, 1, keepdims=True)
                     + jnp.sum(wi, 1, keepdims=True))
            w8, wrs = quant_rows(w * vsx)
            if g.kvbits == 4:
                vw = vq2_ref[0, 0]                           # (T2/8, dh)
                vlo = pltpu.bitcast(vw & 0x0F0F0F0F, jnp.int8)
                vhi = pltpu.bitcast((vw >> 4) & 0x0F0F0F0F, jnp.int8)
                half2 = t2 // 2
                w8lo = jax.lax.slice_in_dim(w8, 0, half2, axis=1)
                w8hi = jax.lax.slice_in_dim(w8, half2, t2, axis=1)
                wsum = jnp.sum(w8.astype(f32), axis=1, keepdims=True)
                ov = ((dot8(w8lo, vlo) + dot8(w8hi, vhi))
                      - 8.0 * wsum) * wrs
            else:
                v8 = pltpu.bitcast(vq2_ref[0, 0], jnp.int8)  # (T2, dh)
                ov = dot8(w8, v8) * wrs
            ovi = jax.lax.dot_general(wi, vc, (((1,), (0,)), ((), ())))
            rows = (ov + ovi) / denom
            r8, rrs = quant_rows(rows)
            a8_ref[h_i, pb:pb + c, :] = r8
            ars_ref[h_i, pb:pb + c, :] = rrs

    # ---------------- tape-B matmul phases (o, down)
    in_o = jnp.logical_and(s >= o0, s < n2)
    in_dn = s >= dn0
    in_b = jnp.logical_or(in_o, in_dn)
    ndk = g.ffn // ck
    to_ = jnp.clip(s - o0, 0, g.no - 1)
    td = jnp.clip(s - dn0, 0, g.nd - 1)
    j_b = jnp.where(in_dn, td // ndk, to_ // nkc)
    kk_b = jnp.where(in_dn, td % ndk, to_ % nkc)
    first_b = jnp.where(in_dn, kk_b == 0, kk_b == 0)
    last_b = jnp.where(in_dn, kk_b == ndk - 1, kk_b == nkc - 1)

    in_b = jnp.logical_and(in_b, _on("b"))
    in_o = jnp.logical_and(in_o, _on("b"))
    in_dn = jnp.logical_and(in_dn, _on("b"))

    @pl.when(jnp.logical_and(in_b, first_b))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(in_o)
    def _():
        # attention output lives head-major: one (bp, dh) @ (dh, bnb) dot
        # per head of this K-chunk, each folding that head's row scales
        hpc = ck // dh
        part = jnp.zeros((g.bp, bnb), f32)
        if g.wbits == 4:
            lo, hi = nibble_halves(ow_ref)  # (ck/2, bnb) each
            for hh in range(hpc):
                head = kk_b * hpc + hh
                wsl = (lo[hh * dh:(hh + 1) * dh] if hh < hpc // 2
                       else hi[hh * dh - ck // 2:(hh + 1) * dh - ck // 2])
                a8h = a8_ref[head]
                rs = jnp.sum(a8h.astype(f32), axis=1, keepdims=True)
                part += (dot8(a8h, wsl) - 8.0 * rs) * ars_ref[head]
            part = part * scale_b_ref[0]
        else:
            w8 = pltpu.bitcast(ow_ref[...], jnp.int8)[0]  # (ck, bnb)
            for hh in range(hpc):
                head = kk_b * hpc + hh
                part += dot8(a8_ref[head],
                             w8[hh * dh:(hh + 1) * dh]) * ars_ref[head]
        acc_ref[:, :bnb] += part

    @pl.when(in_dn)
    def _():
        if g.wbits == 4:
            lo, hi = nibble_halves(dnw_ref)
            part = (dot4(m8_ref[kk_b], lo, hi)
                    * scale_b_ref[0]) * mrs_ref[kk_b]
        else:
            w8 = pltpu.bitcast(dnw_ref[...], jnp.int8)[0]
            part = dot8(m8_ref[kk_b], w8) * mrs_ref[kk_b]
        acc_ref[:, :bnb] += part

    @pl.when(jnp.logical_and(in_o, last_b))
    def _():
        accv = (acc_ref[:, :bnb] if g.wbits == 4
                else acc_ref[:, :bnb] * scale_b_ref[0])
        x2s_ref[j_b] = xs_ref[j_b] + accv

    @pl.when(jnp.logical_and(in_dn, last_b))
    def _():
        accv = (acc_ref[:, :bnb] if g.wbits == 4
                else acc_ref[:, :bnb] * scale_b_ref[0])
        xnew = x2s_ref[j_b] + accv
        xs_ref[j_b] = xnew
        x_out_ref[0] = xnew.astype(x_out_ref.dtype)

    # scratch snapshots for on-chip debugging (zero prod cost when "")
    if debug_dump == "mlp":
        @pl.when(s == dn0)
        def _():
            dump8_ref[0] = m8_ref[...]
            dumps_ref[0] = mrs_ref[...]
    elif debug_dump == "att":
        @pl.when(s == o0)
        def _():
            dump8_ref[0] = a8_ref[...]
            dumps_ref[0] = ars_ref[...]
    elif debug_dump == "q":
        @pl.when(s == att0)
        def _():
            dump8_ref[0] = qatt_ref[...]
            dumps_ref[0] = qs_ref[...]


# ------------------------------------------------------------------ #
# call assembly
# ------------------------------------------------------------------ #


def _make_index_maps(geo: MegaGeometry):
    g = geo
    qkv0 = 1
    att0 = qkv0 + g.nq
    o0 = att0 + g.na
    n2 = o0 + g.no
    gu0 = n2 + 1
    dn0 = gu0 + g.ng
    SA, SB = g.sa_per_layer, g.sb_per_layer
    nqb = g.wqkv // g.bna
    nob = g.dim // g.bnb
    ndk = g.ffn // g.ck
    qb = g.q_width // g.bna
    kb = 2 * qb   # first v block
    nkb = qb  # k (== v) block count

    def resident3(l, s):
        return (0, 0, 0)

    def resident2(l, s):
        return (0, 0)

    # weight operands walk the per-layer stacked (L, Kp, N) arrays
    # directly (no tape copies): block index (l, kk, j), parked by clip on
    # the phase's first tile before it runs (a free prefetch — the first
    # in-phase step finds its block already resident) and on the last tile
    # after (same index -> no refetch).
    def qkv_w(l, s):
        ta = jnp.clip(s - qkv0, 0, g.nq - 1)
        return (l, ta % g.nkc, ta // g.nkc)

    def gu_gate(l, s):
        ta = jnp.clip(s - gu0, 0, g.ng - 1)
        return (l, ta % g.nkc, ta // g.nkc)

    def gu_up(l, s):
        # up block j sits ffn columns after gate block j in the PLAIN
        # [gate | up] stored layout (the two operands alias one array)
        ta = jnp.clip(s - gu0, 0, g.ng - 1)
        return (l, ta % g.nkc, g.ffn // g.ck + ta // g.nkc)

    def o_w(l, s):
        tb = jnp.clip(s - o0, 0, g.no - 1)
        return (l, tb % g.nkc, tb // g.nkc)

    def dn_w(l, s):
        tb = jnp.clip(s - dn0, 0, g.nd - 1)
        return (l, tb % ndk, tb // ndk)

    def scale_a(l, s):
        in_gu = s >= gu0
        ta = jnp.where(in_gu, jnp.clip(s - gu0, 0, g.ng - 1),
                       jnp.clip(s - qkv0, 0, g.nq - 1))
        if g.wbits == 4:  # one scale row per TILE (per-chunk scales)
            return (l * SA + jnp.where(in_gu, g.nq, 0) + ta, 0, 0)
        return (l * SA + jnp.where(in_gu, nqb, 0) + ta // g.nkc, 0, 0)

    def scale_b(l, s):
        in_dn = s >= dn0
        tb = jnp.where(in_dn, jnp.clip(s - dn0, 0, g.nd - 1),
                       jnp.clip(s - o0, 0, g.no - 1))
        if g.wbits == 4:
            return (l * SB + jnp.where(in_dn, g.no, 0) + tb, 0, 0)
        j = jnp.where(in_dn, tb // ndk, tb // g.nkc)
        return (l * SB + jnp.where(in_dn, nob, 0) + j, 0, 0)

    def norm(l, s):
        return (l * 2 + (s >= n2).astype(jnp.int32), 0, 0)

    def kv_idx(l, s):
        # (layer, batch row-group, head) for the head-major attention walk;
        # the piggyback-prefill step (last group of each head) parks on the
        # head's last decode group — same index, no refetch
        a = jnp.clip(s - att0, 0, g.na - 1)
        return a // g.gpr, jnp.minimum(a % g.gpr, g.nb8 - 1)

    def kq(l, s):
        h, i8 = kv_idx(l, s)
        return (l, i8, h, 0, 0)

    def ksm(l, s):
        h, i8 = kv_idx(l, s)
        return (l, h, i8, 0)

    vq = kq

    def kv2(l, s):
        # working prefill cache (L, H, dh/4, T2[/2]): walked head-major —
        # fetched while the head's decode groups run (a free prefetch),
        # consumed at the head's prefill step
        a = jnp.clip(s - att0, 0, g.na - 1)
        return (l, a // g.gpr, 0, 0)

    def kv2_s(l, s):
        # scales live (L*H, 1, T2): the (1, 1, T2) block mirrors scale_a's
        # proven-on-chip row layout (a 4-D (1,1,1,T2) block read [0,0]
        # produced a row Mosaic refused to sublane-broadcast)
        a = jnp.clip(s - att0, 0, g.na - 1)
        return (l * g.n_heads + a // g.gpr, 0, 0)

    def x_out(l, s):
        td = jnp.clip(s - dn0, 0, g.nd - 1)
        return (jnp.where(s >= dn0, td // ndk, 0), 0, 0)

    def kv_new(l, s):
        # k outputs: block j_a - qb while the k blocks run, parked after
        in_qkv = s < att0
        j = jnp.clip((s - qkv0) // g.nkc - qb, 0, nkb - 1)
        return (l * nkb + jnp.where(in_qkv, j, nkb - 1), 0, 0)

    def kv_new_v(l, s):
        # v outputs: v blocks start at j_a == kb (NOT qb — with nkb > 1 a
        # shared map would park every v block on nkb-1)
        in_qkv = s < att0
        j = jnp.clip((s - qkv0) // g.nkc - kb, 0, nkb - 1)
        return (l * nkb + jnp.where(in_qkv, j, nkb - 1), 0, 0)

    return dict(resident3=resident3, resident2=resident2, qkv_w=qkv_w,
                gu_gate=gu_gate, gu_up=gu_up, o_w=o_w, dn_w=dn_w,
                scale_a=scale_a, scale_b=scale_b, norm=norm,
                kq=kq, ks=ksm, vq=vq, vs=ksm, x_out=x_out, kv_new=kv_new,
                kv_new_v=kv_new_v, kv2=kv2, kv2_s=kv2_s)


def mega_decode_layers(
    x: jax.Array,            # (B, D) current hidden states, bf16
    tapes: dict,             # build_tapes output
    cache: dict,             # k/k_s (D-packed) + v/v_s (T-packed) stacks
    cos: jax.Array,          # (B, head_dim) f32 rope table at each row's pos
    sin: jax.Array,
    geo: MegaGeometry,
    *,
    eps: float = 1e-5,
    sm_scale: float | None = None,
    pf: dict | None = None,
    interpret: bool = False,
    debug_phases: str = "full",
    debug_stub: str = "",
    debug_dump: str = "",
):
    """Run ALL decoder layers for one decode position in one pallas call.

    Returns (x_out (B, D) bf16 — pre-final-norm hidden states,
    knew (L, B, H, dh) int8, knew_s (L, B, H) f32,
    vnew (L, B, H, dh) int8, vnew_s (L, B, H) f32).
    The caller owns the (single) cache column update.

    ``pf`` (piggyback prefill, geo.pf_chunk > 0): dict with the NEXT
    batch's current stream —
      x (c, D) bf16 chunk token embeddings | cos/sin (c, dh) rope at the
      chunk positions | amask (c,) int32 real-token mask | mask (T2,)
      int32 working-cache validity (columns < wp and real) | k/k_s/v/v_s
      the stream's working prefill cache ((L, H, dh/4, T2[/2]) int32,
      (L, H, T2) bf16 scales, (L, H, T2/4[8], dh) int32, (L, H, T2)).
    The chunk rows ride every matmul phase on the idle MXU (the decode
    walk is DMA-bound) and add one attention step per head; a sixth
    return element carries their outputs:
    dict(x (c, D), knew/vnew (L, c, H, dh) int8, knew_s/vnew_s (L, c, H)).
    """
    g = geo
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(g.head_dim))
    b, d = x.shape
    assert b == g.batch and d == g.dim
    assert (pf is not None) == (g.pf_chunk > 0)
    bp, ck, bna, bnb = g.bp, g.ck, g.bna, g.bnb
    # int4 KV: K words are (dh/4, T/2) T-halved nibbles, V words (T/8, dh)
    kv_t = g.t_cap // 2 if g.kvbits == 4 else g.t_cap
    dh4 = g.head_dim // 4
    t4 = g.t_cap // (8 if g.kvbits == 4 else 4)
    nkb = g.q_width // g.bna

    xt = x.reshape(b, g.nkc, ck).transpose(1, 0, 2)
    hpb = bna // g.head_dim
    cosr = cos.astype(jnp.float32)
    sinr = sin.astype(jnp.float32)
    if pf is not None:
        cpf = g.pf_chunk
        gap = g.pf_base - b
        xpf = pf["x"].reshape(cpf, g.nkc, ck).transpose(1, 0, 2)
        xt = jnp.concatenate(
            [xt, jnp.zeros((g.nkc, gap, ck), xt.dtype), xpf], axis=1)
        zrow = jnp.zeros((gap, g.head_dim), jnp.float32)
        cosr = jnp.concatenate([cosr, zrow, pf["cos"].astype(jnp.float32)])
        sinr = jnp.concatenate([sinr, zrow, pf["sin"].astype(jnp.float32)])
    else:
        xt = jnp.pad(xt, ((0, 0), (0, bp - b), (0, 0)))
        cosr = jnp.pad(cosr, ((0, bp - b), (0, 0)))
        sinr = jnp.pad(sinr, ((0, bp - b), (0, 0)))
    xt = xt.astype(jnp.bfloat16)
    cosb = jnp.broadcast_to(cosr[:, None, :], (bp, hpb, g.head_dim))[None]
    sinb = jnp.broadcast_to(sinr[:, None, :], (bp, hpb, g.head_dim))[None]
    half = g.head_dim // 2
    sign = jnp.concatenate(
        [-jnp.ones((half,), jnp.float32), jnp.ones((half,), jnp.float32)]
    ).reshape(1, 1, 1, g.head_dim)
    maskb = jnp.pad(cache["kv_mask"].astype(jnp.int32),
                    ((0, bp - b), (0, 0)))
    # cache stacks pass through unchanged: the KV BlockSpecs window
    # (1, rg, 1, ., .) gathers one head x 8 batch rows per attention step
    kq = cache["k"]
    ks = cache["k_s"].astype(jnp.bfloat16)
    vq = cache["v"]
    vs = cache["v_s"].astype(jnp.bfloat16)

    maps = _make_index_maps(g)
    f32 = jnp.float32
    grid = (g.n_layers, g.steps_per_layer)
    nxc = g.nkc
    ndk = g.ffn // ck

    hpb_ = bna // g.head_dim
    out_shapes = (
        jax.ShapeDtypeStruct((nxc, bp, ck), jnp.bfloat16),           # x_out
        jax.ShapeDtypeStruct((g.n_layers * nkb, bp, hpb_, g.head_dim),
                             jnp.int8),                              # knew
        jax.ShapeDtypeStruct((g.n_layers * nkb, bp, hpb_), f32),     # knew_s
        jax.ShapeDtypeStruct((g.n_layers * nkb, bp, hpb_, g.head_dim),
                             jnp.int8),                              # vnew
        jax.ShapeDtypeStruct((g.n_layers * nkb, bp, hpb_), f32),     # vnew_s
    )
    kernel = functools.partial(_mega_kernel, geo=g, eps=eps,
                               sm_scale=sm_scale,
                               debug_phases=debug_phases,
                               debug_dump=debug_dump)
    # (group, spec, array) triples; debug_stub names comma-separated groups
    # whose arrays are replaced by a single zero block with a constant index
    # map — DMA-pattern bisection for on-chip runtime faults.
    in_triples = [
        ("xin", pl.BlockSpec((nxc, bp, ck), maps["resident3"]), xt),
        ("rope", pl.BlockSpec((1, bp, bna // g.head_dim, g.head_dim),
                              lambda l, s_: (0, 0, 0, 0)), cosb),
        ("rope", pl.BlockSpec((1, bp, bna // g.head_dim, g.head_dim),
                              lambda l, s_: (0, 0, 0, 0)), sinb),
        ("rope", pl.BlockSpec((1, 1, 1, g.head_dim),
                              lambda l, s_: (0, 0, 0, 0)), sign),
        ("mask", pl.BlockSpec((bp, g.t_cap), maps["resident2"]), maskb),
        ("norm", pl.BlockSpec((1, nxc, ck), maps["norm"]), tapes["norms"]),
        # per-layer stacked weights, walked in place (no tape copies);
        # gate and up are two aliased views of ONE stored array
        ("tapes", pl.BlockSpec((1, g.ckw, bna), maps["qkv_w"]),
         tapes["qkv_wp"]),
        ("tapes", pl.BlockSpec((1, g.ckw, ck), maps["gu_gate"]),
         tapes["gu_wp"]),
        ("tapes", pl.BlockSpec((1, g.ckw, ck), maps["gu_up"]),
         tapes["gu_wp"]),
        ("tapes", pl.BlockSpec((1, 1, bna), maps["scale_a"]),
         tapes["scale_a"]),
        ("tapes", pl.BlockSpec((1, g.ckw, bnb), maps["o_w"]),
         tapes["o_wp"]),
        ("tapes", pl.BlockSpec((1, g.ckw, bnb), maps["dn_w"]),
         tapes["dn_wp"]),
        ("tapes", pl.BlockSpec((1, 1, bnb), maps["scale_b"]),
         tapes["scale_b"]),
        ("kv", pl.BlockSpec((1, g.rg, 1, dh4, kv_t), maps["kq"]), kq),
        ("kv", pl.BlockSpec((1, 1, g.rg, g.t_cap), maps["ks"]), ks),
        ("kv", pl.BlockSpec((1, g.rg, 1, t4, g.head_dim), maps["vq"]), vq),
        ("kv", pl.BlockSpec((1, 1, g.rg, g.t_cap), maps["vs"]), vs),
    ]
    if pf is not None:
        kv2_t = g.pf_t // 2 if g.kvbits == 4 else g.pf_t
        t4_2 = g.pf_t // (8 if g.kvbits == 4 else 4)
        # scale/mask rows ride as (N, 1, T2)-shaped stacks with (1, 1, T2)
        # blocks read [0] — the same row layout scale_a uses (proven to
        # sublane-broadcast on chip)
        in_triples += [
            ("pf", pl.BlockSpec((1, 1, dh4, kv2_t), maps["kv2"]), pf["k"]),
            ("pf", pl.BlockSpec((1, 1, g.pf_t), maps["kv2_s"]),
             pf["k_s"].astype(jnp.bfloat16).reshape(-1, 1, g.pf_t)),
            ("pf", pl.BlockSpec((1, 1, t4_2, g.head_dim), maps["kv2"]),
             pf["v"]),
            ("pf", pl.BlockSpec((1, 1, g.pf_t), maps["kv2_s"]),
             pf["v_s"].astype(jnp.bfloat16).reshape(-1, 1, g.pf_t)),
            ("pf", pl.BlockSpec((1, 1, g.pf_t), maps["resident3"]),
             pf["mask"].astype(jnp.int32).reshape(1, 1, g.pf_t)),
            # intra-chunk mask precomputed to (c, c): causal & real-token
            ("pf", pl.BlockSpec((1, g.pf_chunk, g.pf_chunk),
                                maps["resident3"]),
             (jnp.tril(jnp.ones((g.pf_chunk, g.pf_chunk), jnp.int32))
              * pf["amask"].astype(jnp.int32)[None, :])[None]),
        ]
    stubbed = set(filter(None, debug_stub.split(",")))
    in_specs, in_arrays = [], []
    for grp, spec, arr in in_triples:
        if grp in stubbed:
            nd = len(spec.block_shape)
            spec = pl.BlockSpec(spec.block_shape,
                                lambda l, s_, nd=nd: (0,) * nd)
            arr = jnp.zeros(spec.block_shape, arr.dtype)
        in_specs.append(spec)
        in_arrays.append(arr)
    out_specs_full = (
            pl.BlockSpec((1, bp, ck), maps["x_out"]),
            pl.BlockSpec((1, bp, hpb_, g.head_dim),
                         lambda l, s_: maps["kv_new"](l, s_) + (0,)),
            pl.BlockSpec((1, bp, hpb_), maps["kv_new"]),
            pl.BlockSpec((1, bp, hpb_, g.head_dim),
                         lambda l, s_: maps["kv_new_v"](l, s_) + (0,)),
            pl.BlockSpec((1, bp, hpb_), maps["kv_new_v"]),
        )
    if "outs" in stubbed:
        out_specs_full = tuple(
            pl.BlockSpec(sp.block_shape,
                         lambda l, s_, nd=len(sp.block_shape): (0,) * nd)
            for sp in out_specs_full)
    if debug_dump:
        dn = {"mlp": ndk, "att": g.n_heads, "q": g.n_heads}[debug_dump]
        dl = {"mlp": ck, "att": g.head_dim, "q": g.head_dim}[debug_dump]
        out_specs_full = out_specs_full + (
            pl.BlockSpec((1, dn, bp, dl), lambda l, s_: (0, 0, 0, 0)),
            pl.BlockSpec((1, dn, bp, 1), lambda l, s_: (0, 0, 0, 0)),
        )
        out_shapes = out_shapes + (
            jax.ShapeDtypeStruct((1, dn, bp, dl), jnp.int8),
            jax.ShapeDtypeStruct((1, dn, bp, 1), f32),
        )
    x_out, knew, knew_s, vnew, vnew_s, *dumps = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs_full,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((nxc, bp, ck), f32),        # xs
            pltpu.VMEM((nxc, bp, ck), f32),        # x2s
            pltpu.VMEM((nxc, bp, ck), jnp.int8),   # hq
            pltpu.VMEM((nxc, bp, 1), f32),         # hrs
            pltpu.VMEM((g.n_heads, bp, g.head_dim), jnp.int8),      # qatt
            pltpu.VMEM((g.n_heads, bp, 1), f32),                     # qs
            pltpu.VMEM((g.n_heads, bp, g.head_dim), f32),            # kcur
            pltpu.VMEM((g.n_heads, bp, g.head_dim), f32),            # vcur
            pltpu.VMEM((g.n_heads, bp, g.head_dim), jnp.int8),       # a8
            pltpu.VMEM((g.n_heads, bp, 1), f32),                     # ars
            pltpu.VMEM((ndk, bp, ck), jnp.int8),   # m8
            pltpu.VMEM((ndk, bp, 1), f32),         # mrs
            pltpu.VMEM((bp, bna), f32),            # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # rg=24 KV blocks (3 MB x2 operands x2 buffers) + 2 MB tape
            # blocks exceed the default 16 MB scoped-vmem budget; the chip
            # has far more physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*in_arrays)

    x_all = x_out.transpose(1, 0, 2).reshape(bp, d)
    x_new = x_all[:b]
    def fix(t, r0, rows):  # (L*nkb, bp, hpb, dh) -> (L, rows, H, dh)
        t = t.reshape(g.n_layers, nkb, bp, hpb_, g.head_dim)
        t = t[:, :, r0:r0 + rows].transpose(0, 2, 1, 3, 4)
        return t.reshape(g.n_layers, rows, g.n_heads, g.head_dim)
    def fix_s(t, r0, rows):  # (L*nkb, bp, hpb) -> (L, rows, H)
        t = t.reshape(g.n_layers, nkb, bp, hpb_)[:, :, r0:r0 + rows]
        return t.transpose(0, 2, 1, 3).reshape(g.n_layers, rows, g.n_heads)
    out = (x_new, fix(knew, 0, b), fix_s(knew_s, 0, b),
           fix(vnew, 0, b), fix_s(vnew_s, 0, b))
    if pf is not None:
        pb, cpf = g.pf_base, g.pf_chunk
        out = out + (dict(
            x=x_all[pb:pb + cpf],
            knew=fix(knew, pb, cpf), knew_s=fix_s(knew_s, pb, cpf),
            vnew=fix(vnew, pb, cpf), vnew_s=fix_s(vnew_s, pb, cpf)),)
    return out + tuple(dumps) if debug_dump else out


# ------------------------------------------------------------------ #
# XLA reference (CPU fallback + numerics oracle for the kernel)
# ------------------------------------------------------------------ #


def _quant_rows_ref(x):
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    rs = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x * (1.0 / rs)), -127, 127)
    return q, rs  # q kept in f32 (values are exact small ints)


def mega_decode_layers_reference(x, tapes, cache, cos, sin,
                                 geo: MegaGeometry, *, eps=1e-5,
                                 sm_scale=None, pf: dict | None = None):
    """Plain-XLA emulation of the megakernel's exact arithmetic chain
    (per-(row,chunk) int8 activations, int8 attention weights, inline
    current-token term). Runs anywhere; the numerics oracle for
    ``mega_decode_layers``. ``pf`` mirrors the kernel's piggyback-prefill
    contract (same dict, same sixth return element)."""
    from mmor_tpu.ops.quantized_matmul import unpack_int8_rows

    g = geo
    if sm_scale is None:
        sm_scale = 1.0 / float(np.sqrt(g.head_dim))
    f32 = jnp.float32
    b = g.batch
    ck = g.ck
    assert (pf is not None) == (g.pf_chunk > 0)
    cpf = g.pf_chunk
    if pf is not None:
        # chunk rows ride the same row-wise chain: concatenate them after
        # the decode rows (norms / matmuls / rope are row-independent)
        x = jnp.concatenate([x.astype(f32), pf["x"].astype(f32)])
        cos = jnp.concatenate([cos.astype(f32), pf["cos"].astype(f32)])
        sin = jnp.concatenate([sin.astype(f32), pf["sin"].astype(f32)])
        if g.kvbits == 4:
            k2_all = unpack_k_int4(pf["k"], g.pf_t).astype(f32)  # (L,H,T2,dh)
            v2_all = unpack_v_int4(pf["v"], g.pf_t).astype(f32)
        else:
            from mmor_tpu.ops.attention import unpack_kv_heads

            k2_all = unpack_kv_heads(pf["k"]).astype(f32)
            v2_all = unpack_v_tmajor(pf["v"]).astype(f32)
        k2s_all = pf["k_s"].astype(f32)                          # (L,H,T2)
        v2s_all = pf["v_s"].astype(f32)
        pfmask = pf["mask"].astype(jnp.int32).reshape(g.pf_t)
        pfamask = pf["amask"].astype(jnp.int32).reshape(cpf)
    rows = b + cpf
    un = untile_tapes(tapes, g)
    # Weights dequantize PER LAYER inside the loop below (lazy getters):
    # up-front unpacking materializes the full f32 stack (~26 GB at 7B),
    # which fit on CPU but OOMed the on-chip generation check. Per-layer
    # temps are ~0.4 GB and XLA frees each after its layer consumes it.
    if g.wbits == 4:
        from mmor_tpu.ops.quantized_matmul import unpack_int4_rows

        def dq_layer(entry, li):
            """layer li of an int4 entry -> dequantized f32 weights + unit
            colscale (the per-chunk scale folds into the weights; the kernel
            folds it per accumulation step — identical up to f32 rounding)."""
            wp, sc = entry
            wv = unpack_int4_rows(wp[li], block=ck).astype(f32)
            kdim, n = wv.shape
            wv = (wv.reshape(kdim // ck, ck, n)
                  * sc[li][:, None, :]).reshape(kdim, n)
            return wv, jnp.ones((n,), f32)
    else:
        def dq_layer(entry, li):
            wp, sc = entry
            return unpack_int8_rows(wp[li]).astype(f32), sc[li]
    norms = tapes["norms"].reshape(g.n_layers, 2, g.dim)

    from mmor_tpu.ops.attention import unpack_kv_heads

    if g.kvbits == 4:
        k8_all = unpack_k_int4(cache["k"], g.t_cap).astype(f32)
        v8_all = unpack_v_int4(cache["v"], g.t_cap).astype(f32)
    else:
        k8_all = unpack_kv_heads(cache["k"]).astype(f32)   # (L,B,H,T,dh)
        v8_all = unpack_v_tmajor(cache["v"]).astype(f32)   # (L,B,H,T,dh)
    # mega cache scales live (L, H, B, T); math below wants (L, B, H, T)
    ks_all = cache["k_s"].astype(f32).transpose(0, 2, 1, 3)
    vs_all = cache["v_s"].astype(f32).transpose(0, 2, 1, 3)
    mask = cache["kv_mask"].astype(jnp.int32)

    cosr = jnp.tile(cos.astype(f32), (1, g.dim // g.head_dim))  # (rows, D)
    sinr = jnp.tile(sin.astype(f32), (1, g.dim // g.head_dim))
    half = g.head_dim // 2
    pos = jnp.arange(g.dim) % g.head_dim

    def rope(t):  # (rows, D)
        m = t.reshape(rows, g.n_heads, g.head_dim)
        rot = jnp.concatenate([-m[..., half:], m[..., :half]], -1)
        rot = rot.reshape(rows, g.dim)
        return t * cosr + rot * sinr

    def chunk_quant(h):  # (rows, W) -> int values + per-chunk row scales
        nc = h.shape[1] // ck
        hc = h.reshape(rows, nc, ck)
        q, rs = _quant_rows_ref(hc)
        return q, rs  # (rows,nc,ck), (rows,nc,1)

    def mm_quant(h, w, colscale):
        """h (rows, K) f32 -> quantized-chunk matmul vs int-valued w."""
        q, rs = chunk_quant(h)
        nc = q.shape[1]
        acc = jnp.zeros((rows, w.shape[1]), f32)
        for kk in range(nc):
            part = q[:, kk] @ w[kk * ck:(kk + 1) * ck]
            acc = acc + part * rs[:, kk]
        return acc * colscale[None, :]

    x = x.astype(f32)
    knews, knew_ss, vnews, vnew_ss = [], [], [], []
    for li in range(g.n_layers):
        # tie layer li's weight unpack to layer li-1's output: without the
        # barrier XLA's scheduler hoists ALL layers' f32 dequant temps
        # (~0.8 GB each) ahead of the loop — the on-chip generation check
        # OOM'd at 16.1/15.75 GB with per-layer laziness in python only
        (wq_t, wg_t, wo_t, wd_t), x = jax.lax.optimization_barrier(
            ((un["qkv_proj"][0][li], un["gate_up_interleaved"][0][li],
              un["o_proj"][0][li], un["down_proj"][0][li]), x))

        def _dq(entry, wp_li, li=li):
            return dq_layer((wp_li[None], entry[1][li:li + 1]), 0)

        w_qkv_li, s_qkv_li = _dq(un["qkv_proj"], wq_t)
        w_gu_li, s_gu_li = _dq(un["gate_up_interleaved"], wg_t)
        w_o_li, s_o_li = _dq(un["o_proj"], wo_t)
        w_dn_li, s_dn_li = _dq(un["down_proj"], wd_t)
        hvar = jnp.mean(x * x, axis=-1, keepdims=True)
        h = x * jax.lax.rsqrt(hvar + eps) * norms[li, 0]
        qkv = mm_quant(h, w_qkv_li, s_qkv_li)
        q, k, v = jnp.split(qkv, 3, axis=1)
        q, k = rope(q), rope(k)
        q8, qs = _quant_rows_ref((q * sm_scale).reshape(rows, g.n_heads,
                                                        g.head_dim))
        k8n, ksn = _quant_rows_ref(k.reshape(rows, g.n_heads, g.head_dim))
        v8n, vsn = _quant_rows_ref(v.reshape(rows, g.n_heads, g.head_dim))
        kcur = k8n * ksn  # dequantized, matches kernel's kcur
        vcur = v8n * vsn
        knews.append(k8n)
        knew_ss.append(ksn[..., 0])
        vnews.append(v8n)
        vnew_ss.append(vsn[..., 0])

        # attention (per batch row, per head)
        logits = jnp.einsum("bhd,bhtd->bht", q8[:b], k8_all[li])
        logits = logits * qs[:b] * ks_all[li]  # (B,H,T)
        logits = jnp.where(mask[:, None, :] != 0, logits, NEG_INF)
        lcur = jnp.sum(q8[:b] * kcur[:b], axis=-1,
                       keepdims=True) * qs[:b]                   # (B,H,1)
        mmax = jnp.maximum(jnp.max(logits, -1, keepdims=True), lcur)
        w_ = jnp.exp(logits - mmax)
        wc = jnp.exp(lcur - mmax)
        denom = jnp.sum(w_, -1, keepdims=True) + wc
        wv = w_ * vs_all[li]
        w8, wrs = _quant_rows_ref(wv)
        ov = jnp.einsum("bht,bhtd->bhd", w8, v8_all[li]) * wrs
        attn = (ov + wc * vcur[:b]) / denom  # (B,H,dh)

        if pf is not None:
            # piggyback-prefill chunk: the c rows attend to ONE stream's
            # working cache plus an inline causal block over the chunk
            q8c, qsc = q8[b:], qs[b:]                    # (c,H,dh),(c,H,1)
            lg2 = jnp.einsum("chd,htd->cht", q8c, k2_all[li])
            lg2 = lg2 * qsc * k2s_all[li][None]           # (c,H,T2)
            lg2 = jnp.where(pfmask[None, None, :] != 0, lg2, NEG_INF)
            li_ = jnp.einsum("chd,jhd->chj", q8c, kcur[b:]) * qsc
            okm = jnp.logical_and(
                jnp.arange(cpf)[None, None, :] <= jnp.arange(cpf)[:, None,
                                                                  None],
                pfamask[None, None, :] != 0)
            li_ = jnp.where(okm, li_, NEG_INF)            # (c,H,c)
            m2 = jnp.maximum(jnp.max(lg2, -1, keepdims=True),
                             jnp.max(li_, -1, keepdims=True))
            w2 = jnp.exp(lg2 - m2)
            wi = jnp.exp(li_ - m2)
            den2 = (jnp.sum(w2, -1, keepdims=True)
                    + jnp.sum(wi, -1, keepdims=True))
            w28, w2rs = _quant_rows_ref(w2 * v2s_all[li][None])
            ov2 = jnp.einsum("cht,htd->chd", w28, v2_all[li]) * w2rs
            ovi = jnp.einsum("chj,jhd->chd", wi, vcur[b:])
            attn = jnp.concatenate([attn, (ov2 + ovi) / den2])

        # o-projection with per-(row, head) activation quantization
        # (matches the kernel's head-major attention-output layout)
        a8, ars = _quant_rows_ref(attn)
        dh = g.head_dim
        acc = jnp.zeros((rows, g.dim), f32)
        for h in range(g.n_heads):
            acc = acc + (a8[:, h] @ w_o_li[h * dh:(h + 1) * dh]) * ars[:, h]
        x2 = x + acc * s_o_li[None, :]
        h2var = jnp.mean(x2 * x2, axis=-1, keepdims=True)
        h2 = x2 * jax.lax.rsqrt(h2var + eps) * norms[li, 1]
        gu = mm_quant(h2, w_gu_li, s_gu_li)  # interleaved [g_j|u_j]
        half_b = g.bna // 2
        gui = gu.reshape(rows, -1, 2, half_b)
        gate = gui[:, :, 0].reshape(rows, g.ffn)
        up = gui[:, :, 1].reshape(rows, g.ffn)
        m = gate * jax.nn.sigmoid(gate) * up
        x = x2 + mm_quant(m, w_dn_li, s_dn_li)

    knew = jnp.stack(knews).astype(jnp.int8)
    knew_s = jnp.stack(knew_ss)
    vnew = jnp.stack(vnews).astype(jnp.int8)
    vnew_s = jnp.stack(vnew_ss)
    out = (x[:b].astype(jnp.bfloat16), knew[:, :b], knew_s[:, :b],
           vnew[:, :b], vnew_s[:, :b])
    if pf is not None:
        out = out + (dict(
            x=x[b:].astype(jnp.bfloat16),
            knew=knew[:, b:], knew_s=knew_s[:, b:],
            vnew=vnew[:, b:], vnew_s=vnew_s[:, b:]),)
    return out


# ------------------------------------------------------------------ #
# cache update + full decode step
# ------------------------------------------------------------------ #


def pack_k_column(k8: jax.Array) -> jax.Array:
    """int8 (L, B, H, dh) -> int32 (L, B, H, dh/4, 1) D-packed column
    (pack_kv_heads layout: byte b of word r = dh index 4r+b)."""
    l, b, h, dh = k8.shape
    w = k8.reshape(l, b, h, dh // 4, 4).astype(jnp.int32) & 0xFF
    col = (w[..., 0] | (w[..., 1] << 8) | (w[..., 2] << 16)
           | (w[..., 3] << 24))
    return col[..., None]


def apply_kv_update(cache: dict, knew, knew_s, vnew, vnew_s) -> dict:
    """Write the new token's quantized K/V column into the cache at
    ``write_pos`` (one dynamic_update_slice per tensor; V is a T-packed
    read-modify-write of a single word column) and advance the masks.

    The kernel emits int8 columns + scales; with an int4 cache (detected
    from the K stack's T-halved last dim) the column requantizes to the
    4-bit grid (scale x 127/7) and merges as a nibble."""
    wp = cache["write_pos"]
    b = knew.shape[1]
    t = cache["kv_mask"].shape[1]
    int4 = cache["k"].shape[-1] == t // 2
    if int4:
        l, _, h, dh = knew.shape
        k4 = jnp.clip(jnp.round(knew.astype(jnp.float32) * (7.0 / 127.0)),
                      -7, 7)
        v4 = jnp.clip(jnp.round(vnew.astype(jnp.float32) * (7.0 / 127.0)),
                      -7, 7)
        knew_s = knew_s * (127.0 / 7.0)
        vnew_s = vnew_s * (127.0 / 7.0)
        ku = (k4 + 8).astype(jnp.int32) & 0xF
        vu = (v4 + 8).astype(jnp.int32) & 0xF
        half = t // 2
        side = wp // half          # 0: lo nibble, 1: hi nibble
        col = wp % half
        # K: word column `col`, byte b packs dh index 4r+b
        kb = ku.reshape(l, b, h, dh // 4, 4)
        kword = (kb[..., 0] | (kb[..., 1] << 8) | (kb[..., 2] << 16)
                 | (kb[..., 3] << 24))[..., None]      # (L,B,H,dh/4,1)
        kshift = side * 4
        kmask = jnp.left_shift(jnp.int32(0x0F0F0F0F), kshift)
        old = jax.lax.dynamic_slice(cache["k"], (0, 0, 0, 0, col),
                                    (*cache["k"].shape[:4], 1))
        merged = (old & ~kmask) | jnp.left_shift(kword, kshift)
        k = jax.lax.dynamic_update_slice(cache["k"], merged,
                                         (0, 0, 0, 0, col))
        # V: word row (col // 4), byte (col % 4), nibble `side`
        vrow = col // 4
        vshift = 8 * (col % 4) + 4 * side
        oldv = jax.lax.dynamic_slice(cache["v"], (0, 0, 0, vrow, 0),
                                     (*cache["v"].shape[:3], 1,
                                      cache["v"].shape[4]))
        vkeep = ~jnp.left_shift(jnp.int32(0xF), vshift)
        mergedv = (oldv & vkeep) | jnp.left_shift(
            vu[:, :, :, None, :], vshift)
        v = jax.lax.dynamic_update_slice(cache["v"], mergedv,
                                         (0, 0, 0, vrow, 0))
    else:
        k = jax.lax.dynamic_update_slice(
            cache["k"], pack_k_column(knew), (0, 0, 0, 0, wp))
        # V: byte (wp % 4) of word (wp // 4)
        word, byte = wp // 4, wp % 4
        old = jax.lax.dynamic_slice_in_dim(cache["v"], word, 1, axis=3)
        shift = byte * 8
        keep = ~(jnp.int32(0xFF) << shift)
        merged = (old & keep) | (
            (vnew[:, :, :, None, :].astype(jnp.int32) & 0xFF) << shift)
        v = jax.lax.dynamic_update_slice(cache["v"], merged,
                                         (0, 0, 0, word, 0))
    k_s = jax.lax.dynamic_update_slice(
        cache["k_s"],
        knew_s.transpose(0, 2, 1)[..., None].astype(cache["k_s"].dtype),
        (0, 0, 0, wp))
    v_s = jax.lax.dynamic_update_slice(
        cache["v_s"],
        vnew_s.transpose(0, 2, 1)[..., None].astype(cache["v_s"].dtype),
        (0, 0, 0, wp))
    kv_mask = jax.lax.dynamic_update_slice(
        cache["kv_mask"], jnp.ones((b, 1), cache["kv_mask"].dtype), (0, wp))
    return dict(cache, k=k, k_s=k_s, v=v, v_s=v_s, kv_mask=kv_mask,
                write_pos=wp + 1, tok_pos=cache["tok_pos"] + 1)


def rope_tables(tok_pos: jax.Array, head_dim: int, theta: float):
    """(B,) positions -> (cos (B, dh), sin (B, dh)) in the HF half-rotation
    layout (concat of the half-frequency table twice)."""
    half = head_dim // 2
    inv = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    ang = tok_pos.astype(jnp.float32)[:, None] * inv[None, :]
    cos = jnp.concatenate([jnp.cos(ang)] * 2, axis=-1)
    sin = jnp.concatenate([jnp.sin(ang)] * 2, axis=-1)
    return cos, sin


def make_mega_decode_step(cfg: LlamaConfig, geo: MegaGeometry,
                          *, interpret: bool = False, donate: bool = True,
                          force_reference: bool = False,
                          return_logits: bool = False,
                          return_kv: bool = False,
                          update_cache: bool = True):
    """Jitted (head_params, tapes, cache, tok (B,1)) -> (nxt (B,), cache).

    head_params = {embed (V, D), final_norm (D,), lm_head_wp (D/4, V),
    lm_head_scale (V,)}. The cache is DONATED (in-place column updates).
    One megakernel + lm_head matmul + ~10 fused XLA glue ops per token.
    ``force_reference=True`` runs the exact-arithmetic XLA oracle
    (mega_decode_layers_reference) regardless of backend — the on-chip
    generation-parity checks race it against the kernel step.
    ``return_logits=True`` appends the (B, V) f32 logits to the outputs
    (teacher-forced parity checks compare those, not greedy chains).
    ``return_kv=True`` appends the raw quantized column
    (knew, knew_s, vnew, vnew_s) so checks can gate the cache WRITE path.
    ``update_cache=False`` drops the cache output entirely (and never
    donates): a pure observer step for lockstep parity checks, which run
    the reference on the kernel stream's state without paying a second
    cache allocation. Output order: nxt[, cache2][, logits][, kv].
    """
    from mmor_tpu.ops.quantized_matmul import int8_matmul_packed

    use_ref = force_reference or (
        interpret is False and jax.devices()[0].platform not in (
            "tpu", "axon"))

    def step(head_params, tapes, cache, tok):
        x = jnp.take(head_params["embed"], tok[:, 0], axis=0
                     ).astype(jnp.bfloat16)
        cos, sin = rope_tables(cache["tok_pos"], cfg.head_dim,
                               cfg.rope_theta)
        run = (mega_decode_layers_reference if use_ref
               else functools.partial(mega_decode_layers,
                                      interpret=interpret))
        x, knew, knew_s, vnew, vnew_s = run(
            x, tapes, cache, cos, sin, geo, eps=cfg.norm_eps)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        h = (x32 * jax.lax.rsqrt(var + cfg.norm_eps)
             * head_params["final_norm"].astype(jnp.float32))
        logits = int8_matmul_packed(
            h.astype(jnp.bfloat16), head_params["lm_head_wp"],
            head_params["lm_head_scale"], int8_mxu=cfg.quant_int8_mxu)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        outs = (nxt,)
        if update_cache:
            outs += (apply_kv_update(cache, knew, knew_s, vnew, vnew_s),)
        if return_logits:
            outs += (logits.astype(jnp.float32),)
        if return_kv:
            outs += ((knew, knew_s, vnew, vnew_s),)
        return outs if len(outs) > 1 else outs[0]

    dn = (2,) if (donate and update_cache) else ()
    return jax.jit(step, donate_argnums=dn)


def make_mega_lm(lm_params: dict, geo: MegaGeometry) -> tuple[dict, dict]:
    """LlamaModel param tree (the inner ``params`` dict with quantized
    fused blocks) -> (tapes, head_params) for ``make_mega_decode_step``.
    One-time relayout at engine build."""
    p = lm_params["params"] if "params" in lm_params else lm_params
    # eager: jit would copy the pass-through weight arrays into fresh
    # output buffers, recreating the tape duplicate this layout removed
    tapes = build_tapes(p["blocks"], geo)
    head = dict(
        embed=p["embed_tokens"]["embedding"],
        final_norm=p["final_norm"]["scale"],
        lm_head_wp=p["lm_head"]["w_p"],
        lm_head_scale=p["lm_head"]["scale"],
    )
    return tapes, head


class MegaServer:
    """Serving bundle for the megakernel decode path: tapes/head built once
    from the LM params, one jitted step per (batch, cache-capacity) bucket.
    """

    def __init__(self, cfg: LlamaConfig, lm_params: dict):
        self.cfg = cfg
        probe_geo = MegaGeometry.from_config(cfg, batch=1, t_cap=8)
        self.tapes, self.head = make_mega_lm(lm_params, probe_geo)
        self._steps: dict = {}

    def step_for(self, batch: int, t_cap: int):
        key = (batch, t_cap)
        if key not in self._steps:
            geo = MegaGeometry.from_config(self.cfg, batch=batch,
                                           t_cap=t_cap)
            self._steps[key] = make_mega_decode_step(self.cfg, geo)
        return self._steps[key]


_COMPACT_AXES = {"k": 1, "v": 1, "k_s": 2, "v_s": 2, "kv_mask": 0,
                 "tok_pos": 0}


@functools.partial(jax.jit, donate_argnums=(0,))
def compact_cache(cache: dict, lane_idx: jax.Array) -> dict:
    """Gather the live batch lanes out of a (donated) decode cache.

    ``lane_idx`` (new_batch,) int32 indexes the CURRENT lane axis; pad
    entries may repeat a live lane (their outputs are discarded by the
    host loop). new_batch must satisfy the kernel's batch % 8 == 0."""
    return {
        k: (jnp.take(v, lane_idx, axis=_COMPACT_AXES[k])
            if k in _COMPACT_AXES else v)
        for k, v in cache.items()
    }


def greedy_decode_hostloop_mega(
    server: MegaServer,
    prompt_logits: jax.Array,
    cache: dict,
    max_new_tokens: int,
    *,
    eos_token_id: int,
    compact: bool = True,
    compact_every: int = 64,
):
    """Greedy decode via one megakernel call per token (host-driven,
    donated cache). Semantics match models/llama.greedy_decode_hostloop.

    Per-sequence EOS early-exit (the reference decodes all 300 tokens in
    lockstep, `main.py:55-60` / HF generate stops only when the WHOLE
    batch finishes): every ``compact_every`` steps the finished rows are
    dropped and the live lanes re-packed into the smallest 8-multiple
    batch bucket, so finished sequences stop paying decode bandwidth. The
    kernel is row-independent (per-row attention, per-(row, chunk)
    activation quantization), so surviving rows' tokens are bit-identical
    to the uncompacted walk (tests/test_mega_decode.py pins this). The
    one-off lane gather costs about one decode step; each bucket's step
    compiles once per process and is reused across generations."""
    batch = prompt_logits.shape[0]
    # layout-independent capacity (the int4 K stack's last dim is T/2)
    t_cap = cache["kv_mask"].shape[1]
    step = server.step_for(batch, t_cap)
    tok = jnp.argmax(prompt_logits[:, -1, :], axis=-1).astype(jnp.int32)

    fill = eos_token_id if eos_token_id >= 0 else 0
    out = np.full((batch, max_new_tokens), fill, np.int32)
    cur_rows = np.arange(batch)  # original row of each real lane
    seg_start = 0
    toks_seg = [tok]
    for i in range(1, max_new_tokens + 1):
        if i < max_new_tokens:
            tok, cache = step(server.head, server.tapes, cache, tok[:, None])
            toks_seg.append(tok)
        boundary = (eos_token_id >= 0 and i % compact_every == 0)
        if i < max_new_tokens and not boundary:
            continue
        # sync the segment out (one host round-trip per compact_every)
        seg = np.asarray(jnp.stack(toks_seg, axis=1))[: len(cur_rows)]
        out[cur_rows[:, None],
            seg_start + np.arange(seg.shape[1])[None]] = seg
        seg_start += seg.shape[1]
        toks_seg = []
        if i >= max_new_tokens:
            break
        done = (out[:, :seg_start] == eos_token_id).any(axis=1)
        if done.all():
            break
        lane_live = np.nonzero(~done[cur_rows])[0]
        bucket = max(8, -(-len(lane_live) // 8) * 8)
        if compact and bucket < len(cur_rows):
            pad = np.full(bucket - len(lane_live), lane_live[0])
            gidx = jnp.asarray(np.concatenate([lane_live, pad]), jnp.int32)
            cache = compact_cache(cache, gidx)
            tok = jnp.take(tok, gidx, axis=0)
            cur_rows = cur_rows[lane_live]
            step = server.step_for(bucket, t_cap)
    for b in range(batch):
        hits = np.nonzero(out[b] == eos_token_id)[0]
        if hits.size:
            out[b, hits[0]:] = eos_token_id
    return jnp.asarray(out), cache

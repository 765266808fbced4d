"""Per-lane live-ray compaction for the post-primary transport.

After the primary trace only ~hit-fraction of the frame's rays do any
further work (secondary bounces, the 3-light batched shadow trace, env
NEE), but the transport runs full-width: traversal blocks and shading
lanes sit at 10-25% occupancy even after the block-granular hit-first
permutation (integrator._tile_permutation). This module packs the live
lanes DENSELY into a capped buffer so every downstream launch runs at
~100% lane occupancy — the work-proportional counterpart of the
reference's per-pixel early exit (webgl.js:1173-1186 terminates each
pixel's loop independently; a lock-step vector machine has to compact
instead).

Only movement primitives measured fast on TPU v5e are used
(tools/compact_cost.py, 1080p, round 3):

  forward:  stable live-first lane order via argsort of the miss mask
            (3.7 ms) + ONE [cap, 16] packed row gather (4.2 ms). The
            9 per-array lane gathers this replaces cost ~30 ms, and a
            full-width per-lane permutation ~144 ms — the round-2
            reason per-lane compaction was first rejected.
  inverse:  a live lane's compact position is cumsum(live)-1 — MONOTONE,
            so each 128-lane group's radiance lives in a <=129-wide
            window of the compact buffer: one [g, 256, 4] window gather
            + a one-hot [128, 256] x [256, 4] MXU matmul per group
            (1.6 ms) replaces the 13.9 ms row scatter (which no
            sorted/unique scatter hint improves).

The cap bounds the dense buffer; the integrator falls back to the
block-permutation path via lax.cond when a frame's live count exceeds
it (both branches compile; one executes per frame). The dense buffer is
scanned in CHUNK-ray chunks with an all-dead cond skip, so the padding
between n_live and cap costs ~nothing.

Measured on TPU v5e round 3 (tools/bench_compact.py, 1080p, full-matrix
subprocess race): the payoff scales with per-sweep cost, so routing is
by cluster count (integrator.COMPACT_MIN_CLUSTERS). 10000 spheres
(K=127, hit 8.2%): permuted 447.9 ms/frame; compact cap=n/8 wins at
every chunk size, best 389.6 at chunk 65536 (1.15x; cap=n/12 hit 389.0
but sits within 2% of that scene's live count — fallback cliff — so n/8
is the default). 1000 spheres (K=10, hit 4.7%): compact LOSES at every
knob (best 117.2 vs 112.7 permuted at _PERM_BLOCK=32) — cheap [1024,128]
sweeps don't repay the pack/expand moves, so low-K scenes keep the block
permutation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

WINDOW = 256  # expansion window: >= 128 group lanes + 1 straddle row
CHUNK = 65536  # dense-buffer scan chunk (64 Pallas trace blocks; raced)


def compact_cap(n: int, div: int = 8) -> tuple[int, int]:
    """Static live-buffer capacity and scan-chunk size: n/div rounded up
    to a 1024 multiple (the Pallas trace BLOCK, so the dense prefix tiles
    exactly), then to a whole number of scan chunks."""
    import os

    raw = max(1024, -(-(n // div) // 1024) * 1024)
    chunk = min(int(os.environ.get("WRT_COMPACT_CHUNK") or CHUNK), raw)
    cap = -(-raw // chunk) * chunk
    return cap, chunk


def live_first_index(live, cap: int):
    """[cap] i32 lane ids: the live lanes in ascending order, then
    (arbitrary, valid) lane ids as padding. Stable argsort keeps the
    order consistent with cumsum(live)-1, which expand_triple relies
    on. WRT_IDX=nonzero swaps in jnp.nonzero(size=cap) — same ascending
    live prefix, lane-0 padding (padding rows are masked by the
    callers' alive = lanes < n_live prefix masks either way); raced vs
    the argsort on TPU v5e."""
    import os

    if os.environ.get("WRT_IDX") == "nonzero":
        n = live.shape[0]
        return jnp.nonzero(live, size=cap,
                           fill_value=n - 1)[0].astype(jnp.int32)
    return jnp.argsort(~live, stable=True)[:cap]


def _as_f32_bits(c):
    if c.dtype == jnp.float32:
        return c
    return jax.lax.bitcast_convert_type(c, jnp.float32)


def pack_rows(cols):
    """S [n] arrays (f32 or bit-cast u32/i32) -> ONE [n, 16] f32 row
    matrix, so the compaction gather moves 64-byte rows instead of
    paying 9x per-index overhead on separate [n] gathers."""
    f32 = [_as_f32_bits(c) for c in cols]
    assert len(f32) <= 16
    f32 += [jnp.zeros_like(f32[0])] * (16 - len(f32))
    return jnp.stack(f32, axis=1)


def gather_rows(packed, idx):
    """[cap, 16] <- packed[idx]; idx from live_first_index is sorted and
    unique (hints let XLA skip bounds/dedup work). The WRT_IDX=nonzero
    index repeats its padding lane, so the unique hint is dropped there
    (harmless for a gather, but keep the hints honest)."""
    import os

    unique = os.environ.get("WRT_IDX") != "nonzero"
    return jnp.take(packed, idx, axis=0, unique_indices=unique,
                    indices_are_sorted=True)


def gather_rows_perm(packed, idx):
    """[cap, 16] <- packed[idx] for an arbitrary permutation (the binned
    transport's coherence re-packs): unique but NOT sorted."""
    return jnp.take(packed, idx, axis=0, unique_indices=True)


def _morton3(cx, cy, cz, bits: int):
    """Interleave `bits` low bits of three i32 grids into a Morton code —
    the spatial half of the binned transport's coherence key. Unrolled
    shifts (bits <= 4), all [cap]-wide elementwise."""
    code = jnp.zeros_like(cx)
    for b in range(bits):
        code = (code
                | (((cx >> b) & 1) << (3 * b + 2))
                | (((cy >> b) & 1) << (3 * b + 1))
                | (((cz >> b) & 1) << (3 * b)))
    return code


def bin_key(o3, d3, lo, inv_extent, cells_log2: int = 3,
            mode: str = "cell_oct"):
    """Coherence key for secondary/shadow ray re-binning (VERDICT r04
    item 1b): rays sharing a key traverse near-identical cluster sets, so
    sorting a live buffer by it shrinks each 1024-ray trace block's
    front-to-back cluster union toward the per-ray chain length — without
    any per-lane gather beyond the re-pack's one row gather.

    o3/d3: component triples ([cap]); lo / inv_extent: scene AABB lower
    corner and 1/extent ([3], traced); cells_log2: bits per axis of the
    origin cell grid; mode: key composition —
      cell_oct: Morton(cell) major, direction octant minor (default:
                shadow fans share origins, not directions);
      oct_cell: octant major (groups by direction first);
      cell:     origin cell only;
      oct:      direction octant only."""
    g = 1 << cells_log2
    cx = jnp.clip(((o3[0] - lo[0]) * inv_extent[0] * g).astype(jnp.int32),
                  0, g - 1)
    cy = jnp.clip(((o3[1] - lo[1]) * inv_extent[1] * g).astype(jnp.int32),
                  0, g - 1)
    cz = jnp.clip(((o3[2] - lo[2]) * inv_extent[2] * g).astype(jnp.int32),
                  0, g - 1)
    cell = _morton3(cx, cy, cz, cells_log2)
    octant = ((d3[0] < 0.0).astype(jnp.int32) * 4
              + (d3[1] < 0.0).astype(jnp.int32) * 2
              + (d3[2] < 0.0).astype(jnp.int32))
    if mode == "oct_cell":
        return octant * (g * g * g) + cell
    if mode == "cell":
        return cell
    if mode == "oct":
        return octant
    return cell * 8 + octant


def expand_cols(cols, live, gdiv: int | None = None):
    """Inverse move: 1..4 [cap] f32 columns accumulated in compact
    (live-first, order-preserving) order -> full-order columns (zeros on
    dead lanes). The k-th set bit of `live` reads compact row k.

    pos = cumsum(live)-1 is monotone, so the compact rows feeding input
    group g all sit in rows [base_g, base_g+129) of the buffer: gather
    that window once per group and select each lane's row with a one-hot
    MXU matmul (Precision.HIGHEST: one-hot selection is exact in the
    3-pass f32 decomposition; default-precision bf16 passes would
    truncate the radiance).

    The one-hot tensor is the cost: [g, 128, WINDOW] f32 is ~2 GB of HBM
    traffic at 1080p (g = 16200) and measured 13 ms as the binned
    transport's final stage (PROFILE_binned_r05.json round 5). Since only
    groups CONTAINING a live lane need any selection (~10-25% of groups on
    sparse frames), the expand runs on a live-group-compacted [gcap]
    subset and one [g]-row block gather (2 KB rows, DMA-friendly)
    assembles the full frame from the subset plus a zero row. Exactness
    is unchanged: the same one-hot selection runs on the selected groups,
    dead groups read an exact zero row. Falls back to all groups via
    lax.cond when live groups exceed gcap (= g/gdiv, WRT_EXPAND_GDIV,
    default 4)."""
    ncols = len(cols)
    assert 1 <= ncols <= 4
    n = live.shape[0]
    g = n // 128
    cap = cols[0].shape[0]
    rows = jnp.stack(list(cols) + [jnp.zeros_like(cols[0])] * (4 - ncols),
                     axis=1)
    pos = jnp.cumsum(live.astype(jnp.int32)) - 1
    posg = pos.reshape(g, 128)
    base = jnp.maximum(posg[:, 0], 0)
    livg = live.reshape(g, 128)
    warange = jnp.arange(WINDOW, dtype=jnp.int32)

    def select(base_s, posg_s, livg_s):
        """One-hot window selection for a set of groups -> [gs, 128, 4]."""
        win_idx = (base_s[:, None] + warange[None, :]) % cap
        win = jnp.take(rows, win_idx, axis=0)            # [gs, W, 4]
        rel = posg_s - base_s[:, None]                   # [gs, 128]
        onehot = (rel[:, :, None] == warange[None, None, :]
                  ).astype(jnp.float32)
        out = jax.lax.dot_general(
            onehot, win, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)         # [gs, 128, 4]
        return jnp.where(livg_s[:, :, None], out, 0.0)

    if gdiv is None:
        import os

        gdiv = int(os.environ.get("WRT_EXPAND_GDIV") or 4)
    gcap = g if gdiv <= 1 else max(8, -(-g // gdiv))
    if gcap >= g:
        out = select(base, posg, livg)
        return tuple(out[:, :, c].reshape(n) for c in range(ncols))

    glive = jnp.any(livg, axis=1)                        # [g]
    n_glive = jnp.sum(glive.astype(jnp.int32))

    def compacted(_):
        gorder = jnp.argsort(~glive, stable=True)[:gcap]
        out_s = select(base[gorder], posg[gorder], livg[gorder])
        # group gi's subset slot = its rank among live groups (monotone,
        # consistent with the stable argsort); dead groups read the
        # appended zero row.
        slot = jnp.where(glive, jnp.cumsum(glive.astype(jnp.int32)) - 1,
                         gcap)
        padded = jnp.concatenate(
            [out_s, jnp.zeros((1, 128, 4), jnp.float32)], axis=0)
        return jnp.take(padded, slot, axis=0)            # [g, 128, 4]

    def full(_):
        return select(base, posg, livg)

    out = jax.lax.cond(n_glive <= gcap, compacted, full, None)
    return tuple(out[:, :, c].reshape(n) for c in range(ncols))


def expand_triple(compact_triple, live):
    """expand_cols for the radiance-triple case (the original move)."""
    return expand_cols(tuple(compact_triple), live)

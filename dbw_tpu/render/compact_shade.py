"""Compacted fragment shading: pay per-fragment costs only for VALID slots.

The dense training pipeline (renderer._shade_fused_batched) streams every
(pixel, K) fragment slot through the fused Pallas kernel, the quad texture
gather and the layered blend — but on block scenes only ~7-25% of slots are
covered (blocks occupy a minority of pixels; most of the K=10 layers are
empty even on covered pixels). Valid fragments are a per-(view, pixel)
PREFIX of the K slots (the selection kernel emits ascending-z with -1
padding), so the valid set in flat fragment order is recoverable with ONE
single-operand sort:

    key[i] = i            if valid
             i + N        otherwise
    skey = sort(key)  ->  skey[:count] = valid fragment indices, in order

Everything downstream then runs on the first M = N/div rows (a lax.switch
ladder picks the smallest sufficient cap; the dense path is the last-resort
branch, so gradients/outputs are NEVER dropped):

- fused_fragment_shade on M rows (render/fragment_fused.py, unchanged),
- the quad texture gather on M rows (render/meshes.py _sample_quad — its
  own sort-compacted backward then also runs at M),
- the layered blend in compacted space: a segmented Hillis-Steele product
  scan over (1 - alpha) (segments = per-pixel fragment runs, length <= K)
  gives the front-to-back occlusion, and a cumsum + one boundary gather
  reduces weighted colors to per-pixel RGB. The boundary indices are the
  (dense, cheap) cumulative per-pixel valid counts, so empty pixels
  difference to exactly zero; the custom VJP is a single sorted gather at
  the pixel ids — no scatter anywhere in forward or backward.

Numerics: per-fragment alpha/color math is bitwise identical to the dense
path (same kernels, same inputs); the blend accumulates in the same
front-to-back order per pixel (the dense path interleaves multiplications
by exactly 1.0 for empty slots), so results differ only by float summation
association in the per-pixel color sum (cumsum vs K-axis reduce) — a few
ULPs. Reference semantics: src/model/renderer.py:241-273.
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp


def _compact_mode():
    return os.environ.get("DBW_COMPACT_SHADE", "auto").lower()


def compact_shade_enabled(K):
    """Gate: flat-fused training path only, and only where sparsity pays
    (K > 1 soft pass; the K = 1 env pass is ~100% covered)."""
    mode = _compact_mode()
    if mode in ("0", "off", "false"):
        return False
    if mode in ("1", "on", "true"):
        return K > 1
    # auto: ON for accelerator backends (measured on the v5e, BENCH_NOTES
    # round 4: 9.7 steps/s vs 6.6 dense at the DTU bench shape; equality
    # pinned by tests/test_compact_shade.py). CPU keeps dense — the sort
    # pipeline is tuned for TPU tile shapes, and the suite compares the
    # two paths explicitly anyway.
    import jax

    return K > 1 and jax.default_backend() != "cpu"


def _compact_div():
    """Tightest cap divisor of the [N/div, ..., N/3, dense] ladder."""
    try:
        return int(os.environ.get("DBW_COMPACT_SHADE_DIV", "16"))
    except ValueError:
        return 16


def _remat_policy():
    """Remat policy for the COMPACT ladder branches.

    ``DBW_COMPACT_REMAT=stream``: save the per-fragment compacted stream
    (fused-kernel outputs + its 8-row residual + texel colors, all tagged
    ``checkpoint_name('compact_stream')``) so the backward of the taken
    branch re-derives only cheap index math instead of re-running the
    fused fragment kernel and the quad gather forward (~40 ms of the
    234 ms epoch-0 step re-ran the taken branch's forward — BENCH_NOTES
    round-4 step trace). Residual cost: O(M) dense rows per rung
    (~100-170 MB at the DTU shape), zero-filled in the non-taken
    branches by lax.switch residual unioning.

    ``full`` (default until chip-measured): the round-4 behavior —
    branches carry no residuals, backward re-runs the taken forward."""
    mode = os.environ.get("DBW_COMPACT_REMAT", "full").lower()
    if mode == "stream":
        return jax.checkpoint_policies.save_only_these_names(
            "compact_stream")
    return None


# ---------------------------------------------------------------------------
# segmented inclusive product scan (Hillis-Steele over runs of equal ids)

def segmented_cumprod(vals, seg_start, n_rounds):
    """Inclusive product scan of ``vals`` restarting where ``seg_start``;
    runs must be no longer than 2**n_rounds. Pure shifts/multiplies — cheap
    and cleanly differentiable (product rule through the multiply tree)."""
    p = vals
    f = seg_start
    s = 1
    for _ in range(n_rounds):
        p_prev = jnp.concatenate([jnp.ones((s,), p.dtype), p[:-s]])
        f_prev = jnp.concatenate([jnp.ones((s,), jnp.bool_), f[:-s]])
        p = jnp.where(f, p, p * p_prev)
        f = f | f_prev
        s *= 2
    return p


# ---------------------------------------------------------------------------
# per-pixel reduction: cumsum + ONE boundary gather; backward = ONE sorted
# gather at the pixel ids (no scatter)

@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _seg_blend(wc, occ_incl, pixel_c, e, R):
    """wc: (M, 3) alpha-weighted colors (zero rows beyond the valid count);
    occ_incl: (M,) inclusive per-run product of (1 - alpha); pixel_c: (M,)
    non-decreasing pixel id per fragment (== R for padding rows); e: (R,)
    index of the LAST fragment at-or-before each pixel (cumulative valid
    count - 1; == e[p-1] when pixel p is empty, -1 before any fragment).

    Returns (rgb (R, 3), occ_last (R,)). occ_last is meaningful only where
    the pixel has fragments — the caller masks empty pixels to 1."""
    return _seg_blend_fwd(wc, occ_incl, pixel_c, e, R)[0]


def _seg_blend_fwd(wc, occ_incl, pixel_c, e, R):
    M = wc.shape[0]
    cs = jnp.cumsum(wc, axis=0)                           # (M, 3)
    A = jnp.concatenate([cs, occ_incl[:, None]], axis=1)  # (M, 4)
    G = jnp.where((e >= 0)[:, None], A[jnp.clip(e, 0, M - 1)], 0.0)  # (R, 4)
    prev = jnp.concatenate([jnp.zeros((1, 4), G.dtype), G[:-1]], axis=0)
    rgb = G[:, :3] - prev[:, :3]   # empty pixels: e[p] == e[p-1] -> exactly 0
    occ_last = G[:, 3]
    return (rgb, occ_last), pixel_c


def _seg_blend_bwd(R, pixel_c, g):
    d_rgb, d_occ = g
    D = jnp.concatenate(
        [
            jnp.concatenate([d_rgb, d_occ[:, None]], axis=1),
            jnp.zeros((1, 4), d_rgb.dtype),               # overflow row
        ],
        axis=0,
    )  # (R + 1, 4)
    rows = D[jnp.minimum(pixel_c, R)]                     # (M, 4) sorted gather
    d_wc = rows[:, :3]
    is_end = jnp.concatenate(
        [pixel_c[1:] != pixel_c[:-1], jnp.ones((1,), jnp.bool_)]
    )
    d_occ_incl = jnp.where(is_end & (pixel_c < R), rows[:, 3], 0.0)
    return d_wc, d_occ_incl, None, None


_seg_blend.defvjp(_seg_blend_fwd, _seg_blend_bwd)


# ---------------------------------------------------------------------------
# the full compacted pipeline

def _shade_compacted(M, dynT, p2f_flat, skey, counts_pix, sigma, flags,
                     maps_flat, TWt, ambient, background_color, dims, F,
                     full_h_row0):
    """One ladder branch: shade the first M compacted fragments.

    Only entered when the total valid count <= M (lax.switch predicate), so
    e = cumsum(counts) - 1 indexes the full valid prefix exactly."""
    B, Hs, Ws, K = dims
    NB = p2f_flat.shape[0]
    R = B * Hs * Ws
    from .fragment_fused import fused_fragment_shade
    from .meshes import _sample_quad

    sl = skey[:M]
    valid_c = sl < NB
    oidx = jnp.where(valid_c, sl, sl - NB)            # original fragment idx
    face = p2f_flat[oidx]                             # (M,) sorted gather
    view = oidx // (Hs * Ws * K)
    ids_c = jnp.where(valid_c, face + view * F, 0)
    vld_f = valid_c.astype(jnp.float32)

    # pixel NDC centers: closed-form from the fragment index (no gathers).
    # Under pixel-band sharding Hs is the BAND height; the NDC scale and
    # row offset come from the full image (full_h_row0) so band fragments
    # shade bit-identically to the full-frame path.
    Hf, row0 = full_h_row0
    pix = (oidx // K) % (Hs * Ws)
    prow = jnp.asarray(row0, jnp.float32) + (pix // Ws).astype(jnp.float32)
    pcol = pix % Ws
    s = min(Hf, Ws)
    px = (Ws - 1.0 - 2.0 * pcol.astype(jnp.float32)) / s
    py = (Hf - 1.0 - 2.0 * prow) / s

    id00, wx, wy, alpha = fused_fragment_shade(
        dynT, ids_c, vld_f, px, py, sigma, flags
    )
    # the compacted fragment stream: under the stream-saving remat policy
    # these (M,)-sized tensors are kept as residuals so the backward
    # re-derives only the cheap index math, not the fused kernel forward
    from jax.ad_checkpoint import checkpoint_name

    name = lambda x: checkpoint_name(x, "compact_stream")
    id00, wx, wy, alpha = name(id00), name(wx), name(wy), name(alpha)
    colors = _sample_quad(maps_flat, id00, wx, wy, TWt)   # (M, 3)
    colors = name(colors)
    if ambient is not None:
        colors = colors * jnp.asarray(ambient)

    pixel_c = jnp.where(valid_c, oidx // K, R)            # global pixel id
    seg_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), pixel_c[1:] != pixel_c[:-1]]
    )
    n_rounds = max(int(math.ceil(math.log2(max(K, 2)))), 1)
    occ_incl = segmented_cumprod(1.0 - alpha, seg_start, n_rounds)
    occ_before = jnp.where(
        seg_start,
        jnp.ones((), occ_incl.dtype),
        jnp.concatenate([jnp.ones((1,), occ_incl.dtype), occ_incl[:-1]]),
    )
    w = alpha * occ_before
    wc = w[:, None] * colors

    e = jnp.cumsum(counts_pix) - 1                        # (R,)
    (rgb, occ_last) = _seg_blend(wc, occ_incl, pixel_c, e, R)
    T = jnp.where(counts_pix > 0, occ_last, 1.0)          # transmittance
    rgb = rgb + T[:, None] * jnp.asarray(background_color)
    a = 1.0 - T
    img = jnp.concatenate([rgb, a[:, None]], axis=1)
    return img.reshape(B, Hs, Ws, 4)


def compact_fragment_shade(dynT, p2f_b, sigma, flags, maps_flat, TWt,
                           ambient, background_color, F, dense_fn,
                           full_h_row0=None):
    """Compacted replacement for gather+shade+blend of the flat-fused
    training path. dense_fn() is the unmodified dense pipeline, used as the
    last-resort ladder branch (identical outputs, never dropped work).

    full_h_row0=(H_full, row0): pixel-band sharding — p2f_b is the band of
    rows [row0, row0 + Hs) of an H_full-tall image (see renderer.render)."""
    try:
        from jax._src.interpreters.batching import BatchTracer
    except ImportError:  # pragma: no cover - jax internals moved
        BatchTracer = ()

    if isinstance(p2f_b, BatchTracer):
        # under vmap (e.g. the per-device seed axis of the multi-seed
        # trainer) lax.switch degenerates to a select that executes EVERY
        # branch — compaction would then ADD work instead of saving it
        return dense_fn()

    B, Hs, Ws, K = p2f_b.shape
    dims = (B, Hs, Ws, K)
    if full_h_row0 is None:
        full_h_row0 = (Hs, 0.0)
    NB = B * Hs * Ws * K
    p2f_flat = p2f_b.reshape(NB)
    vld = p2f_flat >= 0
    counts_pix = jnp.sum(
        vld.reshape(B * Hs * Ws, K).astype(jnp.int32), axis=1
    )
    count = jnp.sum(counts_pix)

    idx = jnp.arange(NB, dtype=jnp.int32)
    key = jnp.where(vld, idx, idx + NB)
    (skey,) = jax.lax.sort((key,), num_keys=1)

    div = _compact_div()
    # lane-quantum alignment; the fused kernel pads its stream to SUB*CH
    # internally, so a finer cap costs at most one extra padded block.
    # Exactly TWO rungs ([N/div, N/3]) + dense: a third intermediate rung
    # was tried (round 4) and sent the server-side XLA compile pathological
    # (>25 min, killed) — every rung replicates the whole fused pipeline in
    # the step graph. DIV=16 measured best on the v5e (BENCH_NOTES round 4).
    align = lambda m: min(NB, -(-m // 128) * 128)
    caps = sorted({align(NB // max(div, 2)), align(NB // 3)} - {NB})

    def branch(M):
        return lambda: _shade_compacted(
            M, dynT, p2f_flat, skey, counts_pix, sigma, flags,
            maps_flat, TWt, ambient, background_color, dims, F,
            full_h_row0,
        )

    # Every branch is rematerialized: lax.switch AD otherwise UNIONS the
    # branches' residuals — each branch must emit zero-filled stand-ins for
    # every other branch's saved tensors, and the dense branch's rank-5
    # (B, H, W, K, C) fragment tensors tile-pad up to 204x against the
    # (8, 128) TPU tile (measured: 4 x 3.66 GB zero broadcasts -> 21.4 GB
    # program, instant OOM at DTU scale). With jax.checkpoint the switch
    # carries NO residuals (closed-over tracers become remat inputs) and
    # the backward re-runs only the TAKEN branch's forward — cheap by
    # construction for the compact branches, and the dense fallback is the
    # rare-overflow case. prevent_cse=False: the step runs inside lax.scan
    # where XLA cannot CSE across the remat boundary anyway (jax docs).
    remat = partial(jax.checkpoint, prevent_cse=False)
    pol = _remat_policy()
    remat_c = (
        partial(jax.checkpoint, prevent_cse=False, policy=pol)
        if pol is not None else remat
    )
    # stream policy applies to the COMPACT branches only — their saved
    # streams are (M,)-sized and dense; the dense fallback branch stays
    # fully rematerialized (its residuals are the rank-5 tile-padding
    # disaster documented above, and it is the rare-overflow case)
    branches = [remat_c(branch(M)) for M in caps] + [remat(dense_fn)]
    which = sum((count > M).astype(jnp.int32) for M in caps)
    return jax.lax.switch(which, branches)

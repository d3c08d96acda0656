"""Pallas TPU rasterization kernel: per-pixel top-K face selection.

Drop-in replacement for the XLA selection backend (rasterize.py) — same
contract: ``pix_to_face (H, W, K) int32`` sorted near-to-far, -1 = miss,
computed under stop_gradient (gradients flow through the separate XLA
interpolation stage; replaces PyTorch3D's `rasterize_meshes` CUDA kernel,
reference: src/model/renderer.py:53).

Kernel design (flash-attention-style streaming over faces):

- grid = (views, H/8, W/16) pixel tiles; each program owns 8x16 = 128
  pixels, flattened to the sublane axis of (128, C) score arrays
  (tile-size sweep on v5e: 8x16 beats 16x16 by ~13% and 32x32 by ~30% —
  small tiles cull face chunks far more effectively and keep the K-slot
  state arrays small),
- optional grid coarsening (DBW_SEL_COARSEN): one program processes G
  consecutive column tiles in an in-kernel loop — same per-tile working
  set and culling, 1/G the program count (amortizes program
  prologue/pipeline overhead),
- faces are packed on host into an (16, F_pad) attribute matrix (vertex
  xy, z, validity, bbox) living in VMEM and streamed in chunks of C = 128
  lanes,
- a chunk whose face bboxes miss the (blur-inflated) tile box is SKIPPED
  with real control flow (`@pl.when`) — block scenes are spatially
  coherent (80 contiguous faces per block) so most chunks cull,
- per chunk, coverage + depth keys are computed exactly as in the XLA
  path (signed edge distance, perspective-corrected clipped-bary z), then
  merged into a K-slot running-best state by iterated min-extraction
  (exact, duplicate-safe via lane-index tie-break),
- a final K-step selection emits slots in ascending-z order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.0e38
BIG_I = 2**30

TH, TW = 8, 16           # pixel tile (128 px / program)
PT = TH * TW
CHUNK = 128              # face-pack quantum; per-call chunk via _sel_chunk()
A_PAD = 16               # padded attribute rows


def _sel_chunk():
    """Faces per streamed chunk (DBW_SEL_CHUNK; must divide F_pad, i.e. a
    multiple/divisor-compatible power of two vs the 128 pack quantum)."""
    import os

    env = os.environ.get("DBW_SEL_CHUNK")
    if not env:
        return CHUNK
    # lane-axis dynamic slices must be 128-aligned on TPU (Mosaic rejects
    # sub-lane-tile chunk offsets); reject loudly rather than silently
    # benchmarking the default
    if env not in ("128", "256", "512"):
        raise ValueError(
            f"DBW_SEL_CHUNK={env!r}: must be one of 128, 256, 512"
        )
    return int(env)


def _sel_coarsen(K, hard):
    """Column-tile coarsening factor G (DBW_SEL_COARSEN, default 1)."""
    import os

    env = os.environ.get(
        "DBW_SEL_COARSEN_K1" if K == 1 and hard else "DBW_SEL_COARSEN"
    )
    return max(int(env), 1) if env else 1


def pack_faces(geom):
    """FaceGeom -> (A_PAD, F_pad) f32 packed attribute matrix.

    Rows: x0 y0 x1 y1 x2 y2 z0 z1 z2 valid xmin xmax ymin ymax (+pad)."""
    xy, z, valid = geom.xy, geom.z, geom.valid
    F = xy.shape[0]
    F_pad = -(-F // CHUNK) * CHUNK
    rows = [
        xy[:, 0, 0], xy[:, 0, 1], xy[:, 1, 0], xy[:, 1, 1],
        xy[:, 2, 0], xy[:, 2, 1], z[:, 0], z[:, 1], z[:, 2],
        valid.astype(jnp.float32),
        jnp.min(xy[..., 0], axis=1), jnp.max(xy[..., 0], axis=1),
        jnp.min(xy[..., 1], axis=1), jnp.max(xy[..., 1], axis=1),
    ]
    m = jnp.stack(rows, axis=0)  # (14, F)
    return jnp.pad(m, ((0, A_PAD - m.shape[0]), (0, F_pad - F)))


def _kernel(scalars_ref, faces_ref, out_ref, keys_ref, idxs_ref, *, K, KS,
            n_chunks, chunk, H, W, th, tw, perspective_correct,
            clip_barycentric, z_clip, hard=False, coarsen=1):
    blur = scalars_ref[0]
    inflate = scalars_ref[1]  # sqrt(blur): bbox inflation in NDC units
    s_inv = scalars_ref[2]    # 1 / min(H, W)
    row0 = scalars_ref[3]     # first image row of this raster (pixel-band
    #                           sharding; 0 for a full-image raster). Traced,
    #                           so one compiled program serves every band.
    pt = th * tw

    ti = pl.program_id(1)
    tjc = pl.program_id(2)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (pt, KS), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (pt, chunk), 1)
    lin = jax.lax.broadcasted_iota(jnp.int32, (pt, 1), 0)

    def do_tile(g, _):
        tj = tjc * coarsen + g

        # row0 + band-local row: exact integer-valued f32 arithmetic, so a
        # band raster's py is BITWISE the full raster's at the same row
        row = row0 + (ti * th + lin // tw).astype(jnp.float32)
        col = tj * tw + lin % tw
        px = (W - 1.0 - 2.0 * col.astype(jnp.float32)) * s_inv
        py = (H - 1.0 - 2.0 * row) * s_inv

        # tile bbox in NDC (+x at column 0, +y at row 0)
        tjf = tj.astype(jnp.float32)
        tif = row0 + ti.astype(jnp.float32) * th
        tile_xmax = (W - 1.0 - 2.0 * (tjf * tw)) * s_inv + inflate
        tile_xmin = (W - 1.0 - 2.0 * (tjf * tw + tw - 1)) * s_inv - inflate
        tile_ymax = (H - 1.0 - 2.0 * tif) * s_inv + inflate
        tile_ymin = (H - 1.0 - 2.0 * (tif + th - 1)) * s_inv - inflate

        keys_ref[:] = jnp.full((pt, KS), BIG, jnp.float32)
        idxs_ref[:] = jnp.full((pt, KS), -1, jnp.int32)

        def process_chunk(c, _):
            base = c * chunk
            fa = faces_ref.at[0][:, pl.ds(base, chunk)]  # (A_PAD, chunk) ref view

            f_xmin = fa[10:11, :]
            f_xmax = fa[11:12, :]
            f_ymin = fa[12:13, :]
            f_ymax = fa[13:14, :]
            fvalid = fa[9:10, :] > 0.5
            overlap = (
                (f_xmin <= tile_xmax) & (f_xmax >= tile_xmin)
                & (f_ymin <= tile_ymax) & (f_ymax >= tile_ymin) & fvalid
            )

            @pl.when(jnp.any(overlap))
            def _():
                x0, y0 = fa[0:1, :], fa[1:2, :]   # (1, C): broadcast vs (PT, 1)
                x1, y1 = fa[2:3, :], fa[3:4, :]
                x2, y2 = fa[4:5, :], fa[5:6, :]
                z0, z1, z2 = fa[6:7, :], fa[7:8, :], fa[8:9, :]

                area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
                inv_area = jnp.where(
                    jnp.abs(area) > 1e-12,
                    1.0 / jnp.where(area == 0.0, 1.0, area), 0.0,
                )
                w0 = ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) * inv_area
                w1 = ((x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)) * inv_area
                w2 = ((x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)) * inv_area
                inside = jnp.minimum(jnp.minimum(w0, w1), w2) >= 0.0

                if hard:
                    # blur == 0 statically (hard/env pass): edge-distance
                    # coverage is dead — a pixel is covered iff inside
                    covered = inside
                else:
                    def seg_d2(ax, ay, bx, by):
                        abx, aby = bx - ax, by - ay
                        apx, apy = px - ax, py - ay
                        denom = jnp.maximum(abx * abx + aby * aby, 1e-12)
                        t = jnp.clip((apx * abx + apy * aby) / denom, 0.0, 1.0)
                        dx = apx - t * abx
                        dy = apy - t * aby
                        return dx * dx + dy * dy

                    d2 = jnp.minimum(
                        jnp.minimum(seg_d2(x0, y0, x1, y1),
                                    seg_d2(x1, y1, x2, y2)),
                        seg_d2(x2, y2, x0, y0),
                    )
                    covered = inside | (d2 < blur)

                if perspective_correct:
                    iw0 = w0 / jnp.maximum(z0, 1e-8)
                    iw1 = w1 / jnp.maximum(z1, 1e-8)
                    iw2 = w2 / jnp.maximum(z2, 1e-8)
                    denom = jnp.maximum(iw0 + iw1 + iw2, 1e-12)
                    b0, b1, b2 = iw0 / denom, iw1 / denom, iw2 / denom
                else:
                    b0, b1, b2 = w0, w1, w2
                if clip_barycentric:
                    b0 = jnp.clip(b0, 0.0, 1.0)
                    b1 = jnp.clip(b1, 0.0, 1.0)
                    b2 = jnp.clip(b2, 0.0, 1.0)
                    bs = jnp.maximum(b0 + b1 + b2, 1e-6)
                    b0, b1, b2 = b0 / bs, b1 / bs, b2 / bs
                z = b0 * z0 + b1 * z1 + b2 * z2

                ok = covered & (fa[9:10, :] > 0.5) & (z > z_clip)

                # blur-inflated bboxes often overlap the tile while covering no
                # pixel at all — skip the K-pass insert loop entirely then
                @pl.when(jnp.any(ok))
                def _():
                    chunk_keys = jnp.where(ok, z, BIG)  # (PT, CHUNK)
                    chunk_fidx = base + lane

                    if K == 1:
                        # hard/env pass: plain running (z, idx) min — no K-slot
                        # machinery (strict < keeps the earliest face on ties,
                        # matching the general path's ordering)
                        cmin = jnp.min(chunk_keys, axis=-1, keepdims=True)
                        cml = jnp.min(
                            jnp.where(chunk_keys == cmin, lane, BIG_I),
                            axis=-1, keepdims=True,
                        )
                        cidx = jnp.min(
                            jnp.where(lane == cml, chunk_fidx, BIG_I),
                            axis=-1, keepdims=True,
                        )
                        best = keys_ref[:, 0:1]
                        take = cmin < best
                        keys_ref[:, 0:1] = jnp.where(take, cmin, best)
                        idxs_ref[:, 0:1] = jnp.where(
                            take, cidx, idxs_ref[:, 0:1]
                        )
                        return

                    def insert_cond(carry):
                        i, ck, keys, idxs = carry
                        # stop early once no pixel has a candidate that could
                        # still enter its top-K (typical chunks insert 2-4
                        # faces, not K)
                        return (i < K) & (jnp.min(ck) < BIG)

                    def insert(carry):
                        i, ck, keys, idxs = carry
                        cmin = jnp.min(ck, axis=-1, keepdims=True)
                        cml = jnp.min(
                            jnp.where(ck == cmin, lane, BIG_I),
                            axis=-1, keepdims=True,
                        )
                        cidx = jnp.min(
                            jnp.where(lane == cml, chunk_fidx, BIG_I),
                            axis=-1, keepdims=True,
                        )
                        smax = jnp.max(keys, axis=-1, keepdims=True)
                        sml = jnp.min(
                            jnp.where(keys == smax, slot_iota, BIG_I),
                            axis=-1, keepdims=True,
                        )
                        take = cmin < smax
                        at_slot = slot_iota == sml
                        keys = jnp.where(take & at_slot, cmin, keys)
                        idxs = jnp.where(take & at_slot, cidx, idxs)
                        ck = jnp.where(take & (lane == cml), BIG, ck)
                        # a pixel whose best candidate cannot beat its worst
                        # slot is DONE for this chunk: blank its whole row
                        ck = jnp.where(take, ck, BIG)
                        return i + 1, ck, keys, idxs

                    _, _, keys, idxs = jax.lax.while_loop(
                        insert_cond, insert,
                        (0, chunk_keys, keys_ref[:], idxs_ref[:]),
                    )
                    keys_ref[:] = keys
                    idxs_ref[:] = idxs

        jax.lax.fori_loop(0, n_chunks, process_chunk, None)

        # emit K slots in ascending-z order
        keys = keys_ref[:]
        idxs = idxs_ref[:]
        ordered = jnp.full((pt, KS), -1, jnp.int32)
        for k in range(K):
            m = jnp.min(keys, axis=-1, keepdims=True)
            sml = jnp.min(
                jnp.where(keys == m, slot_iota, BIG_I), axis=-1, keepdims=True
            )
            fidx = jnp.min(
                jnp.where(slot_iota == sml, idxs, BIG_I), axis=-1, keepdims=True
            )
            hit = (m < BIG) & (fidx >= 0) & (fidx < BIG_I)
            val = jnp.where(hit, fidx, -1)
            ordered = jnp.where(slot_iota == k, val, ordered)
            keys = jnp.where(slot_iota == sml, BIG, keys)
        out_ref[0, 0, pl.ds(g * pt, pt)] = ordered[:, :K]
        return _

    if coarsen == 1:
        do_tile(0, None)
    else:
        jax.lax.fori_loop(0, coarsen, do_tile, None)


def _tile_for(K, hard=False):
    """Pixel-tile + slot-state shape per K (sweeps in BENCH_NOTES.md).

    K == 1 hard (env pass): no segment-distance intermediates, so a 2x
    bigger 16x16 tile fits the VREG budget and halves the program count
    (the env dome covers every tile — culling can't help). Everything
    else: 8x16 — bigger tiles mean (pt, CHUNK) intermediates of 64+ VREGs
    and the VPU starts spilling; culling also degrades with tile area."""
    import os

    env = os.environ.get("DBW_SEL_TILE_K1" if K == 1 else "DBW_SEL_TILE")
    if env:
        parts = [int(v) for v in env.lower().split("x")]
        if len(parts) == 2:  # "16x16" -> default slot count for this K
            parts.append(8 if K == 1 else 128)
        th, tw, ks = parts
        if ks < K:
            raise ValueError(
                f"DBW_SEL_TILE{'_K1' if K == 1 else ''}={env!r}: slot count "
                f"{ks} < faces_per_pixel {K}"
            )
        return th, tw, ks
    if K == 1:
        return (16, 16, 8) if hard else (TH, TW, 8)
    return TH, TW, 128


def rasterize_pallas_batched(packed_faces, blur_radius, cfg, hard=None,
                             row_range=None):
    """packed_faces: (B, A_PAD, F_pad). Returns pix_to_face (B, H, W, K).

    hard: statically-known blur == 0 (the hard/env renderer config) ->
    compile the coverage-is-inside specialization (skips the 3 segment
    distances). Callers with a config-constant sigma pass this; otherwise
    it is inferred only when blur_radius is a concrete scalar.

    row_range=(row0, Hb): rasterize only the Hb-row band starting at image
    row row0 (row0 may be traced — the pixel-band sharding passes each
    device's lax.axis_index-derived offset through ONE compiled program).
    Output is (B, Hb, W, K), bitwise the full raster's rows [row0, row0+Hb)
    (NDC pixel math stays in full-image coordinates)."""
    B, _, F_pad = packed_faces.shape
    H, W = cfg.image_size
    Hb = H if row_range is None else int(row_range[1])
    row0 = 0.0 if row_range is None else row_range[0]
    K = cfg.faces_per_pixel
    if hard is None:
        try:  # concrete (python/np scalar or committed Array) blur only
            hard = not isinstance(blur_radius, jax.core.Tracer) and (
                float(blur_radius) == 0.0
            )
        except (jax.errors.ConcretizationTypeError, TypeError):
            hard = False
    th, tw, KS = _tile_for(K, hard)
    pt = th * tw
    assert K <= KS
    n_th = -(-Hb // th)
    n_tw = -(-W // tw)
    G = _sel_coarsen(K, hard)
    n_twg = -(-n_tw // G)      # coarse grid columns (G tiles / program)
    n_tw = n_twg * G           # pad the column-tile count up to a multiple
    chunk = _sel_chunk()
    if F_pad % chunk:
        pad = -(-F_pad // chunk) * chunk - F_pad
        packed_faces = jnp.pad(packed_faces, ((0, 0), (0, 0), (0, pad)))
        F_pad += pad
    n_chunks = F_pad // chunk
    s = min(H, W)

    blur = jnp.asarray(blur_radius, jnp.float32)
    scalars = jnp.stack(
        [blur, jnp.sqrt(jnp.maximum(blur, 0.0)), jnp.float32(1.0 / s),
         jnp.asarray(row0, jnp.float32)]
    )

    kernel = functools.partial(
        _kernel, K=K, KS=KS, n_chunks=n_chunks, chunk=chunk, H=float(H),
        W=float(W), th=th, tw=tw,
        perspective_correct=cfg.perspective_correct,
        clip_barycentric=cfg.clip_barycentric, z_clip=cfg.z_clip, hard=hard,
        coarsen=G,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_th, n_twg),
        in_specs=[
            # index maps receive the scalar-prefetch ref as a trailing arg
            pl.BlockSpec((1, A_PAD, F_pad), lambda b, i, j, s: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G * pt, K), lambda b, i, j, s: (b, i * n_twg + j, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((pt, KS), jnp.float32),
            pltpu.VMEM((pt, KS), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, n_th * n_twg, G * pt, K), jnp.int32
        ),
    )(scalars, packed_faces)
    # sub-tile g of program (i, j) covers rows [i*th, (i+1)*th) and
    # columns [(j*G+g)*tw, ...): unfold (coarse cols, G, th, tw) -> (H, W)
    out = out.reshape(B, n_th, n_twg, G, th, tw, K)
    out = out.transpose(0, 1, 4, 2, 3, 5, 6).reshape(
        B, n_th * th, n_tw * tw, K
    )
    return out[:, :Hb, :W]


def rasterize_pallas(geom, blur_radius, cfg, row_range=None):
    """Single-view entry matching rasterize.rasterize's contract."""
    packed = pack_faces(geom)[None]
    return rasterize_pallas_batched(
        packed, blur_radius, cfg, row_range=row_range
    )[0]

"""Pallas TPU kernel for the engine-2 level scan (device_dp.py).

The lax.scan path pays per-step dispatch overhead on every level of the
(t_pos, delta) lattice — ~10k scan steps for a 50 kb window.  This kernel
runs the whole scan in ONE launch: a sequential grid streams chunked level
slabs HBM->VMEM (Pallas double-buffers block transfers automatically) while
the DP carry (previous level + boundary ring, device_dp.py's `(prev, bnd)`)
rides the inner loop registers, spilling to VMEM scratch only across grid
steps.

Dynamic single-row VMEM accesses cost ~8 us each on this hardware, so the
inner loop walks GROUPS of 8 levels: one aligned [8, 6E] block load per
group, statically-unrolled register slices per level, and one [8, 6] block
store of the winners.

Per level:
  * the predecessor gather `src[pp_idx]` is an exact one-hot matmul on the
    MXU.  The TPU's default f32 dot truncates inputs to bf16, so scores are
    split into four 8-bit chunks (each exact in bf16; one-hot rows select a
    single term, so the f32 accumulation is exact) stacked into a single
    [4E, .] operand — one hardware pass instead of a 6-pass HIGHEST dot;
  * the same trick transposes the level's scores from their e-major lane
    layout into the [slot, cell] carry layout (Mosaic has no lanes->
    sublanes shape cast);
  * the read-type winning-entry selection (the C's insertion-order loop,
    lib/ctg_cns.c:1876-2125) is unrolled over the E entry slots in an
    e-major lane layout so each slot's 6 cells are one contiguous slice.

Layout contract with the caller (see device_dp._run_batch_pallas):
  A/M[b, l, e * 6 + c] — e-major (slot-major) packed entry words;
  meta[b, l] = (cov << 8) | ((vslot + 1) << 2) | (is_d0 << 1) | is_pad.
Semantics are bit-identical to device_dp._dp_level (tested in
tests/test_device_dp.py against the lax.scan path, which is in turn
byte-parity-tested against the reference .so).
"""
from __future__ import annotations

from functools import partial

NEG = -(2 ** 29)
NEGINIT = -(2 ** 30)

F_VALID = 1
F_HEAD = 2
F_COND1A = 4
F_COND2B = 8
F_PPB_NOT_GAP = 16

CL = 256  # levels per grid step (block rows streamed per chunk)
G = 8     # levels per inner group (aligned sublane tile)


def _kernel(A_ref, M_ref, meta_ref, best_ref, sc_ref, src_ref, out8_ref,
            *, E, Vb, rt_id, cov_coef):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    NSRC = (Vb + 1) * 6  # ring cells + previous-level cells
    C6 = 6 * E

    @pl.when(pl.program_id(1) == 0)
    def _init():
        src_ref[:, :] = jnp.full((E, NSRC), NEG, jnp.int32)

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (E, C6), 0)  # pred slot
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (NSRC, C6), 0)
    iota_lane6 = jax.lax.broadcasted_iota(jnp.int32, (E, NSRC), 1) // 6
    # transpose helpers: rowsel picks lane block 6n for sublane n; colsel
    # tiles cell lanes across the (Vb + 1) source slots
    rowsel = (iota_n == jax.lax.broadcasted_iota(jnp.int32, (E, C6), 1)
              // 6)
    colsel = (jax.lax.broadcasted_iota(jnp.int32, (C6, NSRC), 0) % 6
              == jax.lax.broadcasted_iota(jnp.int32, (C6, NSRC), 1) % 6
              ).astype(jnp.float32)

    def chunks4(x, mask=None):
        """Stack x (int32, |x| < 2^30) as four 8-bit chunks along sublanes
        — every chunk is exact in bf16, so a default-precision one-hot
        matmul reproduces the int exactly."""
        parts = [x & 0xFF, (x >> 8) & 0xFF, (x >> 16) & 0xFF, x >> 24]
        if mask is not None:
            parts = [jnp.where(mask, p, 0) for p in parts]
        return jnp.concatenate([p.astype(jnp.float32) for p in parts],
                               axis=0)

    def recombine4(g):
        """Invert chunks4 after the matmul (rows grouped by chunk)."""
        k = g.shape[0] // 4
        return (g[:k].astype(jnp.int32)
                + (g[k:2 * k].astype(jnp.int32) << 8)
                + (g[2 * k:3 * k].astype(jnp.int32) << 16)
                + (g[3 * k:].astype(jnp.int32) << 24))

    def level(a, m, meta, src):
        """One level: a/m [1, C6] registers, meta scalar, src [E, NSRC].
        Returns (bm [1,6], sc_bm [1,6], new src)."""
        cov = meta >> 8
        vslot = ((meta >> 2) & 0x3F) - 1
        is_d0 = ((meta >> 1) & 1) != 0
        is_pad = (meta & 1) != 0

        link = a >> 16
        pp_idx = (a >> 8) & 0xFF
        flags = a & 0xFF
        valid = (flags & F_VALID) != 0
        is_head = (flags & F_HEAD) != 0
        cond1a = (flags & F_COND1A) != 0
        cond2b = (flags & F_COND2B) != 0
        ppb_ng = (flags & F_PPB_NOT_GAP) != 0

        w = 10 * link - cov_coef * cov

        # ---- predecessor gather: one chunked one-hot matmul ----
        onehot = (iota_j == pp_idx).astype(jnp.float32)  # [NSRC, C6]
        pred = recombine4(jnp.dot(chunks4(src), onehot,
                                  preferred_element_type=jnp.float32))

        # match bits: pred slot n participates iff bit n of match is set
        mbits = ((jnp.broadcast_to(m, (E, C6)) >> iota_n) & 1) != 0
        cand = jnp.where(mbits, pred, NEG)
        n_best = jnp.max(cand, axis=0, keepdims=True)  # [1, C6]
        last_slot = jnp.max(jnp.where(mbits, iota_n, -1), axis=0,
                            keepdims=True)
        pick = iota_n == jnp.maximum(last_slot, 0)
        n_last = jnp.sum(jnp.where(pick, pred, 0), axis=0, keepdims=True)
        has_match = n_best > NEG // 2

        sc = jnp.where(is_head, w,
                       jnp.where(has_match, jnp.maximum(n_best + w, 0), 0))
        sc = jnp.where(valid, sc, NEG)  # [1, C6]

        # ---- winning-entry selection, unrolled over slots ----
        def lane6(x, e):
            return x[:, e * 6:(e + 1) * 6]  # static lane slice

        bm = jnp.zeros((1, 6), jnp.int32)
        sc_bm = lane6(sc, 0)
        link_bm = lane6(link, 0)
        p_pp = jnp.full((1, 6), NEGINIT, jnp.int32)
        raiser = jnp.full((1, 6), NEGINIT, jnp.int32)
        if rt_id == 0:  # ont: tmp = max link over entries per cell
            lr = jnp.where(valid, link, 0)
            tmp = lane6(lr, 0)
            for e in range(1, E):
                tmp = jnp.maximum(tmp, lane6(lr, e))
        for e in range(E):
            v = lane6(valid, e)
            hm = v & ~lane6(is_head, e) & lane6(has_match, e)
            sc_e = lane6(sc, e)
            nb_e = lane6(n_best, e)
            ln_e = lane6(link, e)
            raiser = jnp.where(v & (sc_e > 0), nb_e, raiser)
            ev = jnp.full((1, 6), e, jnp.int32)
            if rt_id in (1, 3):  # clr / hifi
                upd = hm & ((nb_e > p_pp)
                            | ((nb_e == p_pp) & lane6(ppb_ng, e)))
                bm = jnp.where(upd, ev, bm)
                sc_bm = jnp.where(upd, sc_e, sc_bm)
                link_bm = jnp.where(upd, ln_e, link_bm)
                p_pp = jnp.where(upd, nb_e, p_pp)
            elif rt_id == 0:  # ont
                c1 = hm & lane6(cond1a, e) & (
                    (5 * ln_e > cov) | (ln_e > tmp // 2))
                c2 = ~c1 & hm & (ln_e > link_bm // 2) \
                    & (nb_e > p_pp) & lane6(cond2b, e)
                upd = c1 | c2
                bm = jnp.where(upd, ev, bm)
                sc_bm = jnp.where(upd, sc_e, sc_bm)
                link_bm = jnp.where(upd, ln_e, link_bm)
                p_pp = jnp.where(c1, lane6(n_last, e),
                                 jnp.where(c2, nb_e, p_pp))
            # common final rule
            if rt_id == 2:  # rs
                upd = v & (sc_e >= sc_bm)
            else:
                upd = v & ((sc_e > sc_bm)
                           | ((sc_e == sc_bm) & lane6(ppb_ng, e)))
            bm = jnp.where(upd, ev, bm)
            sc_bm = jnp.where(upd, sc_e, sc_bm)
            link_bm = jnp.where(upd, ln_e, link_bm)
            p_pp = jnp.where(upd, raiser, p_pp)

        # ---- carry update (pad levels leave the state untouched) ----
        # sc_tiled[n, v*6+c] = sc[0, n*6+c]: the lanes->sublanes transpose
        # via the same exact chunked one-hot matmul
        B1 = jnp.broadcast_to(sc, (E, C6))
        sc_tiled = recombine4(jnp.dot(chunks4(B1, mask=rowsel), colsel,
                                      preferred_element_type=jnp.float32))
        ring_lane = iota_lane6 < Vb
        rot = jnp.where(ring_lane & is_d0 & ~is_pad,
                        jnp.full((E, NSRC), NEG, jnp.int32), src)
        write_ring = ring_lane & (iota_lane6 == vslot) & (vslot >= 0) \
            & ~is_pad
        out = jnp.where(write_ring, sc_tiled, rot)
        prev_lane = iota_lane6 == Vb
        out = jnp.where(prev_lane & ~is_pad, sc_tiled, out)
        return bm, sc_bm, out

    def group(g, src):
        base = pl.multiple_of(g * G, G)
        A8 = A_ref[0, pl.ds(base, G), :]  # [G, C6] register block
        M8 = M_ref[0, pl.ds(base, G), :]
        for r in range(G):
            meta = meta_ref[0, base + r]
            bm, sc_bm, src = level(A8[r:r + 1, :], M8[r:r + 1, :], meta,
                                   src)
            out8_ref[r, :6] = bm[0]
            out8_ref[r, 6:] = sc_bm[0]
        blk = out8_ref[:, :]
        best_ref[0, pl.ds(base, G), :] = blk[:, :6]
        sc_ref[0, pl.ds(base, G), :] = blk[:, 6:]
        return src

    src = jax.lax.fori_loop(0, CL // G, group, src_ref[:, :])
    src_ref[:, :] = src


_KERNELS = {}


def get_level_scan(E, Vb, rt_id, cov_coef, NCL, P):
    """Compiled pallas scan for the given shape bucket.

    The host->device traffic is the dominant cost on a tunneled link, so
    the dense [NCL, 6E] level slabs (only ~6% occupied) never cross the
    wire: the caller ships compact per-entry streams and the slabs are
    scattered on device inside the same jit as the kernel launch —

      ent8[P]  uint8: (level-advance bit << 7) | (slot*6 + base); entries
               are level-major and every level has >= 1 entry, so level
               deltas are 0/1 and a cumsum reconstructs ent_lvl;
      entA[P]  int32: the packed A word;  entM[P] int32: match bits;
      meta[NCL] int32 (pad bit set past the real levels).

    Returns f(buf) -> (best[NCL,6] int8, sc[NCL,6] int32 device array —
    fetch only the slice you need); buf is the single byte-planar uint8
    buffer device_dp._dispatch_batch_pallas packs."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() == "cpu"  # tests / virtual meshes
    key = (E, Vb, rt_id, cov_coef, NCL, P, interpret)
    fn = _KERNELS.get(key)
    if fn is not None:
        return fn
    NC = NCL // CL
    C6 = 6 * E
    NSRC = (Vb + 1) * 6
    kern = partial(_kernel, E=E, Vb=Vb, rt_id=rt_id, cov_coef=cov_coef)

    @jax.jit
    def run(buf):
        # ONE uint8 buffer crosses the link (4 separate transfers pay 4x
        # the ~30 ms link latency), byte-planar so the tunnel's
        # compression sees uniform lanes.  Layout:
        #   [ent8(P) | entA planes b0..b3 (4P) | entM planes b0..b2 (3P)
        #    | meta planes b0..b3 (4*NCL)]
        ent8 = buf[:P]
        lvl = jnp.cumsum((ent8 >> 7).astype(jnp.int32)) - 1
        col = (ent8 & 0x7F).astype(jnp.int32)
        # padding entries carry col 127 -> the trash slot past the slab
        idx = jnp.where(col < 96, lvl * C6 + col, NCL * C6)
        b = buf.astype(jnp.int32)
        entA = (b[P:2 * P] | (b[2 * P:3 * P] << 8)
                | (b[3 * P:4 * P] << 16) | (b[4 * P:5 * P] << 24))
        # match bits need ceil(E/8) byte planes (E <= 16 -> 2)
        MPL = (E + 7) // 8
        entM = b[5 * P:6 * P]
        for pb in range(1, MPL):
            entM = entM | (b[(5 + pb) * P:(6 + pb) * P] << (8 * pb))
        mb = (5 + MPL) * P
        meta = (b[mb:mb + NCL] | (b[mb + NCL:mb + 2 * NCL] << 8)
                | (b[mb + 2 * NCL:mb + 3 * NCL] << 16)
                | (b[mb + 3 * NCL:mb + 4 * NCL] << 24))
        A = jnp.zeros((NCL * C6 + 1,), jnp.int32).at[idx].set(
            entA, unique_indices=True)[:NCL * C6].reshape(1, NCL, C6)
        M = jnp.zeros((NCL * C6 + 1,), jnp.int32).at[idx].set(
            entM, unique_indices=True)[:NCL * C6].reshape(1, NCL, C6)
        best, sc = pl.pallas_call(
            kern,
            grid=(1, NC),
            in_specs=[
                pl.BlockSpec((1, CL, C6), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CL, C6), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CL), lambda b, i: (b, i),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, CL, 6), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CL, 6), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, NCL, 6), jnp.int32),
                jax.ShapeDtypeStruct((1, NCL, 6), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((E, NSRC), jnp.int32),
                pltpu.VMEM((G, 12), jnp.int32),
            ],
            interpret=interpret,
        )(A, M, meta.reshape(1, NCL))
        return best[0].astype(jnp.int8), sc[0]

    _KERNELS[key] = run
    return run

"""Stage bisection of the task-1 chain launch on the attached device.

Times cumulative prefixes of chain_correct_packed's internal stages with
chained-repetition differencing (runtime/roofline.time_launches), on a
production-shaped buffer from the bench workload, so the per-stage cost
(decode / transition build / forward scan / pointer passes / traceback /
flags) is separable.  Usage:  python tools/profile_chain.py
"""
from __future__ import annotations

import os
import sys


import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_handle():
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import bench

    rng = np.random.default_rng(0)
    names, trues, batch, _ = bench.make_task1_case(rng, n_contigs=1)
    from nextpolish_tpu.models.score_chain import (
        AlgoConfig,
        score_chain_contig_prep,
    )

    return score_chain_contig_prep(names[0], trues[0], batch, AlgoConfig())


def main():
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/npt_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    import jax
    import jax.numpy as jnp

    from nextpolish_tpu.ops import tropical as tr
    from nextpolish_tpu.ops.symbols import K3, S
    from nextpolish_tpu.runtime import roofline

    os.environ["NPT_CHAIN_IMPL"] = "entries"  # profile the entry-space path
    h = build_handle()
    buf, (_, L, E, TH) = h.buf, h.key
    print(f"shape: L={L} E={E} TH={TH} buf={buf.nbytes/1e6:.2f} MB",
          flush=True)
    chunk = 128

    def decode(b32):
        tail = 3 * E + 2 * L
        s0mask = b32[tail]
        rate = jax.lax.bitcast_convert_type(
            (b32[tail + 1] | (b32[tail + 2] << 16)).astype(jnp.int32),
            jnp.float32)
        n_dp = b32[tail + 3] | (b32[tail + 4] << 16)
        nnz = b32[tail + 5] | (b32[tail + 6] << 16)
        th = (b32[tail + 7:tail + 7 + 2 * TH:2]
              | (b32[tail + 8:tail + 8 + 2 * TH:2] << 16))
        uk = jnp.cumsum(b32[:E])
        uk = jnp.where(jnp.arange(E) < nnz, uk, L * K3)
        cn = b32[E:2 * E]
        rk = b32[2 * E:3 * E]
        rkm = b32[3 * E:3 * E + L]
        total = b32[3 * E + L:3 * E + 2 * L]
        valid = jnp.arange(L, dtype=jnp.int32) < n_dp
        s0 = jnp.where((s0mask >> jnp.arange(S)) & 1 != 0, jnp.float32(0.0),
                       tr.NEG)
        return uk, cn, rk, rkm, total, valid, rate, s0, n_dp, th

    def entries(b32):
        uk, cn, rk, rkm, total, valid, rate, s0, n_dp, th = decode(b32)
        Ltot = L
        e_cell = uk // K3
        e_kmer = uk % K3
        e_b2 = (e_kmer >> 3) & 7
        e_b3 = e_kmer & 7
        is_pad = e_cell >= Ltot
        c_cl = jnp.minimum(e_cell, Ltot - 1)
        tot_e = total[c_cl]
        dec_e = ((tot_e > 1) & (e_kmer == rkm[c_cl])).astype(jnp.float32)
        tot1_e = jnp.where(tot_e > 1, tot_e - 1, tot_e).astype(jnp.float32)
        em_e = jnp.where(is_pad, tr.NEG,
                         cn.astype(jnp.float32) - dec_e - tot1_e * rate)
        return (uk, cn, rk, rkm, total, valid, rate, s0, n_dp, th,
                e_cell, e_kmer, e_b2, e_b3, is_pad, c_cl, em_e)

    def abuild(b32):
        (uk, cn, rk, rkm, total, valid, rate, s0, n_dp, th,
         e_cell, e_kmer, e_b2, e_b3, is_pad, c_cl, em_e) = entries(b32)
        segA = jnp.where(is_pad, L * 64, c_cl * 64 + e_b2 * 8 + e_b3)
        A = jnp.full((L * 64 + 1,), tr.NEG).at[segA].max(
            em_e)[: L * 64].reshape(L, S, S)
        rowmax = jnp.max(A, axis=2)
        A = A.at[:, :, 0].set(rowmax)
        A = jnp.where(valid[:, None, None], A, tr._eye()[None])
        return A, em_e, s0, n_dp, th

    def fwd(b32):
        A, em_e, s0, n_dp, th = abuild(b32)
        f = tr._forward_states(A.reshape(1, L, S, S), s0[None], chunk)
        return f, em_e, n_dp, th

    stages = {}
    stages["1_decode"] = lambda b32: decode(b32)[0]
    stages["2_emission"] = lambda b32: entries(b32)[-1]
    stages["3_Abuild"] = lambda b32: abuild(b32)[0]
    stages["4_fwdscan"] = lambda b32: fwd(b32)[0]

    def pointers(b32):
        (uk, cn, rk, rkm, total, valid, rate, s0, n_dp, th,
         e_cell, e_kmer, e_b2, e_b3, is_pad, c_cl, em_e) = entries(b32)
        segA = jnp.where(is_pad, L * 64, c_cl * 64 + e_b2 * 8 + e_b3)
        A = jnp.full((L * 64 + 1,), tr.NEG).at[segA].max(
            em_e)[: L * 64].reshape(L, S, S)
        rowmax = jnp.max(A, axis=2)
        A = A.at[:, :, 0].set(rowmax)
        A = jnp.where(valid[:, None, None], A, tr._eye()[None])
        f = tr._forward_states(A.reshape(1, L, S, S), s0[None], chunk)
        fprev = jnp.concatenate([s0[None][:, None, :], f[:, :-1]],
                                axis=1).reshape(L, S)
        sc_e = jnp.where(is_pad, tr.NEG, fprev[c_cl, e_b2] + em_e)
        seg3 = jnp.where(is_pad, L * 8, c_cl * 8 + e_b3)
        V = jnp.full((L * 8 + 1,), tr.NEG).at[seg3].max(sc_e)
        obs = jnp.zeros((L * 8 + 1,), jnp.int32).at[seg3].max(
            (~is_pad).astype(jnp.int32)) > 0
        elig = (~is_pad) & (sc_e == V[seg3])
        rk32 = rk.astype(jnp.int32)
        wkey = jnp.where(elig, rk32 * 8 + e_b2, tr.RANK_BIG)
        Wk = jnp.full((L * 8 + 1,), tr.RANK_BIG).at[seg3].min(wkey)
        Rm = jnp.full((L * 8 + 1,), tr.RANK_BIG).at[seg3].min(
            jnp.where(is_pad, tr.RANK_BIG, rk32))
        cov3 = jnp.zeros((L * 8 + 1,), jnp.int32).at[seg3].add(
            jnp.where(is_pad, 0, cn.astype(jnp.int32)))
        V2 = V[: L * 8].reshape(L, S)
        obs2 = obs[: L * 8].reshape(L, S)
        wb2 = jnp.where(obs2, Wk[: L * 8].reshape(L, S) & 7, 0)
        Rm2 = Rm[: L * 8].reshape(L, S)
        Vmax = jnp.max(jnp.where(obs2, V2, tr.NEG), axis=1)
        cand = (V2 == Vmax[:, None]) & obs2
        msel = jnp.argmin(jnp.where(cand, Rm2, tr.RANK_BIG),
                          axis=1).astype(jnp.int32)
        msel_prev = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), msel[:-1]])
        P = jnp.where(wb2 != 0, wb2.astype(jnp.int32), msel_prev[:, None])
        P = jnp.where(valid[:, None], P,
                      jnp.arange(S, dtype=jnp.int32)[None])
        return (P, msel, cov3[: L * 8].reshape(L, S), total, th, n_dp)

    stages["5_pointers"] = lambda b32: pointers(b32)[0]

    def full(b32):
        P, msel, cov2, total, th, n_dp = pointers(b32)
        lastidx = jnp.maximum(n_dp - 1, 0)
        choice = tr._traceback(P, msel[lastidx], chunk)
        cov = jnp.take_along_axis(cov2, choice.astype(jnp.int32)[:, None],
                                  axis=1)[:, 0]
        zero = (total == 1).astype(jnp.int8) << tr.FLAGB_ZERO
        low = (cov < th[jnp.minimum(total, TH - 1)]
               ).astype(jnp.int8) << tr.FLAGB_COV
        return choice | zero | low

    stages["6_full"] = full

    bufd = jax.device_put(buf.astype(np.int32))

    def fetch(hh):
        a = hh
        while isinstance(a, (tuple, list)):
            a = a[0]
        return np.asarray(a.ravel()[:4])

    results = {}
    for name, fn in stages.items():
        jf = jax.jit(fn)
        fetch(jf(bufd))  # compile+warm
        t = roofline.time_launches(lambda: jf(bufd), fetch, n=6)
        results[name] = t
        print(f"{name:12s} {t*1e3:8.2f} ms", flush=True)
    prev = 0.0
    print("--- increments ---")
    for name in sorted(results):
        print(f"{name:12s} +{(results[name]-prev)*1e3:8.2f} ms")
        prev = results[name]


if __name__ == "__main__":
    main()

"""Round-5 experiments on the CG-Schur BA camera path (VERDICT r4 #3).

Target: <= 25 ms/LM-iter forced cg=16 at 512 cams / 200k pts / 2M obs
(round 4: 65 ms).  The LM iteration is fixed work (linearize + cost +
normal-equation assembly + rhs + backsub, ~20 ms) + ~17-19 Schur
applications (in-loop ~3 ms vs 1.9 standalone).  Before building the
"assembled block-sparse S" (which on TPU one-hot machinery costs
2*k*keys FLOPs per slot — prohibitive for general covisibility; see
PERF.md round-5 notes), measure where the matrix-free operator's time
actually goes:

  sapply        production S_apply standalone, chained (reproduce 1.9 ms)
  sapply_flat   ONE flat [D*P] gather/reduce per matvec instead of D
                per-row calls at P each (amortizes chunk padding: P=200k
                pads 131k-chunks 24%; materializes [6,D,P] once)
  sapply_G16    hi/lo group fold G=16 for gather+reduce (MXU M-dim 96
                instead of 24/48 rows — less pad waste)
  sapply_fG     flat + G16
  lmiter        full bundle_adjust_cg secs/LM-iter (ba.bench protocol)
                with whatever patches are active

Usage: python tools/exp_ba.py [names...]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import ransac_tpu.ba.schur_cg as sc
from ransac_tpu.ba.bench import synth_slot_problem
from ransac_tpu.ops.pallas.roofline import _time_best

C, P, D = 512, 200_000, 10


def _operator_inputs(sp):
    """Assemble (W, Vinv, Ud, Minv, fix_mask) exactly as _schur_cg_step
    does, once, on device."""
    lam = jnp.float32(1e-3)

    @jax.jit
    def build(sp):
        r, Jc, Jp = sc._slot_blocks(sp, sp.cameras, sp.points, 0.0)
        ids = sp.slot_cam.reshape(-1)
        U, gc = sc._assemble_cam_blocks(Jc, r, ids, C, lambda x: x)
        V = jnp.stack([jnp.stack([
            sum(Jp[i][a] * Jp[j][a] for a in range(2)).sum(0)
            for j in range(3)]) for i in range(3)])
        dU = jnp.maximum(jnp.diagonal(U, axis1=-2, axis2=-1), 1e-6)
        Ud = U + lam * dU[..., None] * jnp.eye(6, dtype=r.dtype)
        dV = jnp.maximum(jnp.stack([V[0, 0], V[1, 1], V[2, 2]]), 1e-6)
        Vd = V + lam * dV[:, None, :] \
            * jnp.eye(3, dtype=r.dtype)[:, :, None]
        Vinv = sc._inv3x3_lanes(Vd, eps=1e-9)
        W = jnp.moveaxis(jnp.stack([
            jnp.stack([sum(Jc[i][a] * Jp[j][a] for a in range(2))
                       for j in range(3)]) for i in range(6)]), 2, 0)
        Minv = sc._inv_spd_6x6(Ud + 1e-8 * jnp.eye(6, dtype=r.dtype))
        return W, Vinv, Ud, Minv

    W, Vinv, Ud, Minv = build(sp)
    fix_mask = jnp.ones((C,), jnp.float32).at[0].set(0.0)
    return (jax.block_until_ready(W), Vinv, Ud, Minv, fix_mask)


def _cg_step_operator_flat(W, Vinv, slot_cam, Ud, n_cam, fix_mask):
    """S_apply with ONE flat gather + ONE flat reduce per application."""
    D_, P_ = slot_cam.shape
    ids_flat = slot_cam.reshape(-1)

    def S_apply(x):
        x = x * fix_mask[:, None]
        dch = sc._gather_cams_T(x, ids_flat, n_cam).reshape(6, D_, P_)
        t = jnp.zeros((3, P_), x.dtype)
        for d in range(D_):
            t = t + jnp.stack([
                sum(W[d, i, j] * dch[i, d] for i in range(6))
                for j in range(3)])
        u = jnp.stack([sum(Vinv[i, j] * t[j] for j in range(3))
                       for i in range(3)])
        y = jnp.stack([
            jnp.stack([sum(W[d, i, j] * u[j] for j in range(3))
                       for d in range(D_)]) for i in range(6)])
        s = sc._reduce_to_cams_T(y.reshape(6, -1), ids_flat, n_cam)
        out = jnp.einsum("cij,cj->ci", Ud, x) - s
        return out * fix_mask[:, None]

    return S_apply


def time_sapply(name, sp, flat=False, G=None):
    if G is not None:
        sc._gather_G = lambda C_: G
        sc._reduce_G = lambda C_: G
    else:
        sc._gather_G = lambda C_: 4 if C_ > 128 else 1
        sc._reduce_G = lambda C_: 8 if C_ > 128 else 1
    W, Vinv, Ud, Minv, fix_mask = _operator_inputs(sp)
    make = _cg_step_operator_flat if flat else (
        lambda *a: sc._cg_step_operator(*a, lambda x: x))
    S = make(W, Vinv, sp.slot_cam, Ud, C, fix_mask)

    @functools.partial(jax.jit, static_argnames=("n_rep",))
    def chain(seed, n_rep):
        x0 = jnp.ones((C, 6), jnp.float32) \
            * (1.0 + seed.astype(jnp.float32) * 1e-9)

        def body(_, x):
            y = S(x)
            return y / jnp.maximum(jnp.linalg.norm(y), 1e-20)

        return jax.lax.fori_loop(0, n_rep, body, x0)

    dt = _time_best(lambda k, r: chain(jnp.int32(k), r), reps=3,
                    small=2, large=12)
    print(f"{name:12s} {dt*1e3:7.3f} ms/application", flush=True)
    return dt


def time_pieces(sp):
    """Chained timing of the LM iteration's FIXED pieces: linearize
    (_slot_blocks), cost (slot_cost), and the normal-equation assembly
    (_assemble_cam_blocks + V/W) — to see where the ~20 ms non-CG part
    of the 65 ms LM iteration goes."""
    import functools

    @functools.partial(jax.jit, static_argnames=("n_rep", "what"))
    def chain(seed, n_rep, what):
        def body(_, carry):
            s, acc = carry
            cams = sp.cameras * (1.0 + s.astype(jnp.float32) * 1e-9)
            if what == "cost":
                c = sc.slot_cost(sp, cams, sp.points, 0.0)
                return s + 1, acc + c
            r, Jc, Jp = sc._slot_blocks(sp, cams, sp.points, 0.0)
            if what == "blocks":
                return s + 1, acc + r[0, 0, 0]
            ids = sp.slot_cam.reshape(-1)
            U, gc = sc._assemble_cam_blocks(Jc, r, ids, C, lambda x: x)
            V = jnp.stack([jnp.stack([
                sum(Jp[i][a] * Jp[j][a] for a in range(2)).sum(0)
                for j in range(3)]) for i in range(3)])
            W = jnp.moveaxis(jnp.stack([
                jnp.stack([sum(Jc[i][a] * Jp[j][a] for a in range(2))
                           for j in range(3)]) for i in range(6)]), 2, 0)
            return s + 1, acc + U[0, 0, 0] + V[0, 0, 0] + W[0, 0, 0, 0]
        _, acc = jax.lax.fori_loop(0, n_rep, body,
                                   (seed, jnp.float32(0.0)))
        return acc

    for what in ("cost", "blocks", "assemble"):
        dt = _time_best(lambda k, r: chain(jnp.int32(k), r, what),
                        reps=3, small=1, large=5)
        print(f"piece {what:9s} {dt*1e3:7.3f} ms", flush=True)


def time_lmiter(sp, cg_iters=16):
    from ransac_tpu.ba.bench import bench_ba_scale
    out = bench_ba_scale(C, P, D, cg_iters)
    print(f"lmiter       {out['sec_per_lm_iter']*1e3:7.1f} ms/LM-iter "
          f"(cost {out['cost_initial']:.3g} -> {out['cost_final']:.3g})",
          flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["sapply", "sapply_flat", "sapply_G16",
                             "sapply_fG"]
    sp = synth_slot_problem(C, P, D)
    for nm in names:
        t0 = time.time()
        if nm == "sapply":
            time_sapply(nm, sp)
        elif nm == "sapply_flat":
            time_sapply(nm, sp, flat=True)
        elif nm == "sapply_G16":
            time_sapply(nm, sp, G=16)
        elif nm == "sapply_fG":
            time_sapply(nm, sp, flat=True, G=16)
        elif nm == "pieces":
            time_pieces(sp)
        elif nm == "lmiter":
            time_lmiter(sp)
        print(f"  ({time.time()-t0:.0f}s)", flush=True)

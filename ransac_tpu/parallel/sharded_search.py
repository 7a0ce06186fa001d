"""Distributed candidate search: shard_map over a (data, model) mesh.

The TPU-scaling form of the localization pipeline (SURVEY.md §2.5):

- candidate cameras shard over the ``data`` axis (the reference's 458-
  iteration Python loop, main_v1.py:274),
- the RANSAC hypothesis tensor shards over the ``model`` axis (the loop
  inside cv2.findHomography), each shard drawing an independent key-folded
  sample block,
- the per-shard best hypotheses are combined with an all-gather over
  ``model`` and an on-device argmin — no host round-trips.

The same structure scales to multi-host: the mesh simply spans hosts and
XLA routes the all-gather over ICI/DCN.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ransac_tpu.models import ransac as ransac_mod
from ransac_tpu.ops import homography as hops
from ransac_tpu.ops import projection as proj
from ransac_tpu.utils.config import LocalizeConfig, RansacConfig


def _local_candidate_scores(pixels, pos3d, point_mask, cam_locs, keys, rcfg):
    """Score a local block of candidates with a local block of hypotheses.

    Runs inside shard_map: cam_locs is the data-shard, the hypothesis budget
    in ``rcfg`` is already divided by the model-axis size, and ``keys`` are
    per-(candidate, model-shard) fold keys.  Returns per-candidate
    (msac_best, model, inlier_mask, num_inliers).
    """

    def per_candidate(loc, key):
        pos2, _ = proj.east_axis_plane_projection(pos3d, loc)
        flat, valid, counts, msac, best, best_mask = ransac_mod.ransac_fit(
            ransac_mod._h_solve, ransac_mod._h_residual, pos2, pixels,
            point_mask, 4, rcfg, key,
            degenerate_fn=ransac_mod._h_degenerate)
        return msac[best], flat[best], best_mask, counts[best], pos2

    return jax.vmap(per_candidate)(cam_locs, keys)


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def distributed_score_candidates(
    pixels: jnp.ndarray,       # [N,2] replicated
    pos3d: jnp.ndarray,        # [N,3] replicated
    point_mask: jnp.ndarray,   # [N] replicated
    cam_locs: jnp.ndarray,     # [C,3], C divisible by data-axis size
    grid_codes: jnp.ndarray,   # [C]
    cfg: LocalizeConfig,
    key: jax.Array,
    mesh: Mesh,
):
    """Full candidate search sharded (data=candidates, model=hypotheses).

    Output is replicated: err1 [C], err2 [C], best index.  Scoring
    semantics are shared with pipelines.localize.score_candidates
    (reference_scores); the per-candidate refit here is plain DLT without
    the final LM polish (a deliberate throughput trade in the distributed
    path), so scores can differ slightly from the single-mesh pipeline.
    """
    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]
    C = cam_locs.shape[0]
    assert C % n_data == 0, (C, n_data)
    rcfg = cfg.ransac
    # Split the hypothesis budget across the model axis.  Exhaustive mode
    # enumerates all samples on every shard only if it fits the per-shard
    # budget; otherwise shards draw disjoint random blocks via fold keys.
    per_shard = max(rcfg.num_hypotheses // n_model, 64)
    rcfg_local = RansacConfig(
        threshold=rcfg.threshold, num_hypotheses=per_shard,
        exhaustive=rcfg.exhaustive and n_model == 1,
        max_exhaustive_samples=rcfg.max_exhaustive_samples,
        selection=rcfg.selection, refit=False,
        refine_iters=0, seed=rcfg.seed)

    def shard_fn(pixels, pos3d, point_mask, cam_locs_l, grid_l, key):
        di = jax.lax.axis_index("data")
        mi = jax.lax.axis_index("model")
        kk = jax.random.fold_in(jax.random.fold_in(key[0], di), mi)
        keys = jax.random.split(kk, cam_locs_l.shape[0])
        msac_l, model_l, mask_l, count_l, pos2_l = _local_candidate_scores(
            pixels, pos3d, point_mask, cam_locs_l, keys, rcfg_local)

        # Combine hypothesis shards: all-gather over 'model', argmin msac.
        msac_all = jax.lax.all_gather(msac_l, "model")        # [m, c_l]
        model_all = jax.lax.all_gather(model_l, "model")      # [m, c_l, 3,3]
        mask_all = jax.lax.all_gather(mask_l, "model")        # [m, c_l, N]
        best_shard = jnp.argmin(msac_all, axis=0)             # [c_l]
        c_l = msac_l.shape[0]
        take = lambda arr: jnp.take_along_axis(
            arr, best_shard[None, :].reshape((1, c_l) + (1,) * (arr.ndim - 2)),
            axis=0)[0]
        H_best = take(model_all)
        inl = take(mask_all.astype(jnp.float32)) > 0.5

        # Reference err1/err2 scoring on the winning model: shared helper
        # from the single-mesh pipeline (pipelines.localize).  The refit
        # here is plain DLT (no LM polish) — the distributed path trades
        # that final polish for throughput; scoring semantics are shared.
        from ransac_tpu.pipelines.localize import reference_scores

        def score_one(H_raw, inl_c, pos2, loc):
            w = inl_c.astype(pixels.dtype) * point_mask
            H = hops.dlt_homography(pos2, pixels, w)
            bad = jnp.logical_not(jnp.all(jnp.isfinite(H)))
            H = jnp.where(bad, H_raw, H)
            return reference_scores(H, pos2, pixels, inl_c, point_mask,
                                    rcfg.threshold)

        err1_l, err2_l = jax.vmap(score_one)(H_best, inl, pos2_l, cam_locs_l)
        gate = grid_l >= cfg.grid_code_min
        err1_l = jnp.where(gate, err1_l, 0.0)
        err2_l = jnp.where(gate, err2_l, 0.0)
        # Replicate over 'model' rows implicitly (identical on all shards);
        # gather candidate shards over 'data'.
        err1_g = jax.lax.all_gather(err1_l, "data").reshape(-1)
        err2_g = jax.lax.all_gather(err2_l, "data").reshape(-1)
        return err1_g, err2_g

    err1, err2 = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P("data"), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(pixels, pos3d, point_mask, cam_locs, grid_codes, key[None])
    # Zero-score and non-finite guard (mirrors pipelines.localize).
    err2_sel = jnp.where((err2 == 0.0) | ~jnp.isfinite(err2), 1e6, err2)
    best = jnp.argmin(err2_sel)
    return {"err1": err1, "err2": err2, "best": best,
            "best_err2": err2_sel[best]}

#!/usr/bin/env python
"""Headline benchmark: RANSAC hypotheses/s/chip (BASELINE.md target >= 1e5).

Measures the full on-device hypothesize-and-verify chain on one chip —
random 4-point sampling, vmapped normalized-DLT solve, fused Pallas inlier
scoring, on-device selection — at the reference's problem shape (13
correspondences, homography threshold 75 px; /root/reference/main_v1.py:312).
The reference's implied rate is ~147 OpenCV RANSAC *fits*/s of <=2000
hypotheses each, i.e. <=~3e5 hypotheses/s on the author's desktop
(BASELINE.md); the vs_baseline ratio below is against the 1e5/s target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ransac_tpu.ops import homography as hops
    from ransac_tpu.ops.pallas import score as pscore
    from ransac_tpu.utils.prng import sample_without_replacement

    platform = jax.devices()[0].platform
    interpret = platform != "tpu"
    n_points = 13
    n_hyp = 1 << 18 if platform == "tpu" else 1 << 12

    rng = np.random.default_rng(0)
    # Reference-shaped problem: 13 annotated correspondences, plane->pixel.
    H_true = np.array([[900.0, 40.0, 500.0], [-15.0, 850.0, 400.0],
                       [1e-3, 2e-3, 1.0]])
    src = rng.uniform(-1.5, 1.5, size=(n_points, 2)).astype(np.float32)
    dst = np.asarray(hops.apply_h(jnp.asarray(H_true), jnp.asarray(src)))
    dst = (dst + rng.normal(scale=1.0, size=dst.shape)).astype(np.float32)
    dst[9:] += 200.0  # outliers
    mask = np.ones(n_points, np.float32)

    @jax.jit
    def ransac_iter(key, src, dst, mask):
        idx = sample_without_replacement(key, n_hyp, 4, n_points)
        models, ok = jax.vmap(hops.dlt_homography_minimal)(src[idx], dst[idx])
        counts, msac = pscore.homography_scores(
            models, src, dst, mask, 75.0, interpret=interpret)
        msac = jnp.where(ok, msac, jnp.inf)
        best = jnp.argmin(msac)
        return models[best], counts[best], msac[best]

    src_d = jnp.asarray(src)
    dst_d = jnp.asarray(dst)
    mask_d = jnp.asarray(mask)

    # Warmup/compile.
    out = ransac_iter(jax.random.key(0), src_d, dst_d, mask_d)
    jax.block_until_ready(out)

    iters = 30 if platform == "tpu" else 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = ransac_iter(jax.random.key(i), src_d, dst_d, mask_d)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    value = n_hyp / dt
    baseline_target = 1e5
    print(json.dumps({
        "metric": "ransac_hypotheses_per_s_per_chip",
        "value": value,
        "unit": "hypotheses/s",
        "vs_baseline": value / baseline_target,
    }))


if __name__ == "__main__":
    main()

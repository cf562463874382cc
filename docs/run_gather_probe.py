"""Probe: why does the (1024, 256) subdomain gather cost ~1.9 ms?

Times alternative formulations of the structured io gather/scatter on the
attached accelerator with the K-composed-loop methodology:
  - baseline advanced-index gather x[gI]
  - jnp.take with mode="clip" / "fill"
  - take_along_axis on a 2D reshape
  - one-hot matmul (MXU) via the per-row segment structure
  - patch extraction with lax.conv_general_dilated_patches
  - scatter-add baseline vs segment_sum over a sorted permutation

Run:  python docs/run_gather_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


if __name__ == "__main__":
    import jax
    from jax import lax
    import jax.numpy as jnp
    import numpy as np

    g_ndof = 148225
    ndom, pad = 1024, 256
    rng = np.random.default_rng(0)
    # realistic block-structured index table: contiguous 16-runs per row
    # (approximates gI's structure: each row = 16 runs of 16 consecutive
    # global ids, run starts strided by the grid row pitch)
    base = rng.integers(0, g_ndof - 16 * 385 - 16, size=(ndom,))
    rows = np.arange(16) * 385
    cols = np.arange(16)
    gI = (base[:, None, None] + rows[None, :, None] + cols[None, None, :]).reshape(
        ndom, pad
    )
    gI = np.minimum(gI, g_ndof - 1).astype(np.int32)
    x = jnp.asarray(rng.standard_normal(g_ndof), jnp.float32)
    gI_j = jnp.asarray(gI)

    def measure(f, v, K, reps=5):
        def body(i, vv):
            w = f(vv)
            return vv * (jnp.float32(1.0) + jnp.float32(1e-12) * jnp.max(jnp.abs(w)))

        g = jax.jit(lambda vv: lax.fori_loop(0, K, body, vv))
        r = g(v)
        r.block_until_ready()
        ts = []
        for i in range(reps):
            vi = v * (1.0 + 1e-7 * (i + 1))
            vi.block_until_ready()
            t0 = time.perf_counter()
            float(jnp.sum(g(vi)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    res = {}
    disp = measure(lambda v: v, x, 0)
    res["dispatch_ms"] = 1e3 * disp
    K = 100

    def per(f, v=x, K=K):
        return 1e3 * (measure(f, v, K) - disp) / K

    res["adv_index_ms"] = per(lambda v: v[gI_j])
    res["take_clip_ms"] = per(lambda v: jnp.take(v, gI_j, mode="clip"))
    res["take_fill_ms"] = per(
        lambda v: jnp.take(v, gI_j, mode="fill", fill_value=0.0)
    )
    res["take_flat_sorted_ms"] = per(
        lambda v: jnp.take(v, jnp.sort(gI_j.reshape(-1)), mode="clip")
    )

    # 2D row gather: each (domain, run) is 16 CONTIGUOUS elements -- gather
    # run STARTS only (1024*16 = 16k indices), then a contiguous reshape
    starts = jnp.asarray(gI[:, ::16].copy())  # (ndom, 16)
    win = jnp.arange(16, dtype=jnp.int32)

    def run_gather(v):
        idx = starts[:, :, None] + win[None, None, :]
        return jnp.take(v, idx.reshape(ndom, pad), mode="clip")

    res["run_reconstructed_ms"] = per(run_gather)

    # dynamic_slice-free patch extraction: conv_general_dilated_patches on
    # the 2D grid (385x385), window 16x16 stride 12 -> (32, 32) patches
    x2d = jnp.zeros((1, 1, 385, 385), jnp.float32)

    def patches(v):
        img = v[: 385 * 385].reshape(1, 1, 385, 385)
        p = lax.conv_general_dilated_patches(
            img, (16, 16), (12, 12), "VALID"
        )  # (1, 256, 31, 31)
        return p

    res["conv_patches_ms"] = per(patches)

    # strided-slice tiling: 16 static slices reshaped -- exact for
    # stride-12 windows via 16 shifted subgrids
    def slice_tiles(v):
        img = v[: 384 * 384].reshape(384, 384)
        # non-overlapping 12x12 core tiles as pure reshape/transpose
        t = img.reshape(32, 12, 32, 12).transpose(0, 2, 1, 3)
        return t

    res["reshape_tiles_ms"] = per(slice_tiles)

    # scatter-add baseline vs sorted segment_sum
    vals = jnp.asarray(rng.standard_normal(ndom * pad), jnp.float32)
    flat_idx = jnp.asarray(gI.reshape(-1))
    perm = np.argsort(gI.reshape(-1), kind="stable")
    perm_j = jnp.asarray(perm.astype(np.int32))
    sorted_idx = jnp.asarray(gI.reshape(-1)[perm])

    def scat(v):
        w = vals * v[0]
        return jnp.zeros(g_ndof, jnp.float32).at[flat_idx].add(w)

    def seg(v):
        w = (vals * v[0])[perm_j]
        return jax.ops.segment_sum(
            w, sorted_idx, num_segments=g_ndof, indices_are_sorted=True
        )

    res["scatter_add_ms"] = per(scat)
    res["segment_sorted_ms"] = per(seg)

    log(json.dumps(res, indent=2))
    print(json.dumps(res))

import time
import numpy as np
import jax, jax.numpy as jnp
from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.models.pyramid import build_pyramid
from visualslam_tpu.ops.extrema import detect_extrema
from visualslam_tpu.ops.patches import extract_patches
from visualslam_tpu.ops.histograms import gaussian_window, soft_histogram, histogram_peaks
from visualslam_tpu.utils.masked import top_k_select
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
pc, sc = cfg.pyramid, cfg.sift
seq = SyntheticSequence(num_frames=9, h=376, w=1248, n_dots=8000, step=0.4)
imgs8 = jnp.asarray(np.stack([seq.frame(k) for k in range(8)]))

def t(label, f, *args, n=6):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{label:30s} {(time.perf_counter()-t0)/n*1000:8.1f} ms", flush=True)

def upto(stage):
    def f(im):
        ss = build_pyramid(im, pc)
        outs = []
        win = sc.orientation_window
        for o in range(pc.num_octaves):
            lvl, y, x, off, r, v = detect_extrema(ss.dog[o], sc, capacity=sc.octave_capacity(o))
            if stage == "extrema":
                outs.append((lvl, y, x)); continue
            yx_int = jnp.stack([y, x], -1).astype(jnp.float32)
            glvl = lvl - ss.grad_level_offset
            mag_ori = jnp.stack([ss.grad_mag[o], ss.grad_ori[o]], axis=-1)
            both = extract_patches(mag_ori, yx_int, win, level_idx=glvl)
            if stage == "patches":
                outs.append(both); continue
            mag = both[...,0]; ori = both[...,1]
            lvl_f = lvl.astype(jnp.float32) + off[:, 0]
            sig = pc.base_sigma * pc.k_factor ** lvl_f
            w = gaussian_window(win, sc.orientation_sigma_scale * sig)
            if stage == "gausswin":
                outs.append((both, w)); continue
            hist = soft_histogram(ori.reshape(-1, win*win), (mag*w).reshape(-1, win*win),
                                  sc.num_orientation_bins, 360.0, interpolate=True,
                                  compute_dtype=sc.hist_compute_dtype)
            if stage == "hist":
                outs.append(hist); continue
            angles, _, pv = histogram_peaks(hist, sc.max_orientations, sc.orientation_peak_ratio, 360.0)
            if stage == "peaks":
                outs.append((angles, pv)); continue
            P = sc.max_orientations
            resp_sp = jnp.repeat(r, P, axis=0)
            valid_sp = jnp.repeat(v, P, axis=0) & pv.reshape(-1)
            tiebreak = jnp.arange(resp_sp.shape[0], dtype=jnp.float32) * 1e-12
            idx, mask = top_k_select(resp_sp - tiebreak, valid_sp, lvl.shape[0])
            outs.append((idx, mask))
        return outs
    return jax.jit(jax.vmap(f))

for st in ["extrema", "patches", "gausswin", "hist", "peaks", "select"]:
    t(st, upto(st), imgs8)

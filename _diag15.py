import time
import numpy as np
import jax, jax.numpy as jnp
from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.models.pyramid import build_pyramid
from visualslam_tpu.ops.extrema import detect_extrema
from visualslam_tpu.ops.patches import extract_patches
from visualslam_tpu.ops.histograms import gaussian_window, soft_histogram, histogram_peaks
from visualslam_tpu.utils.config import FAST_CONFIG

cfg = FAST_CONFIG
pc, sc = cfg.pyramid, cfg.sift
seq = SyntheticSequence(num_frames=9, h=376, w=1248, n_dots=8000, step=0.4)
frames = np.stack([seq.frame(k) for k in range(8)])
imgs8 = jnp.asarray(frames)

def t(label, f, *args, n=6):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{label:34s} {(time.perf_counter()-t0)/n*1000:8.1f} ms", flush=True)

def base(im):
    ss = build_pyramid(im, pc)
    return ss, [detect_extrema(ss.dog[o], sc) for o in range(pc.num_octaves)]

def with_patches(im):
    ss, dets = base(im)
    outs = []
    for o in range(pc.num_octaves):
        lvl, y, x, off, r, v = dets[o]
        yx_int = jnp.stack([y, x], -1).astype(jnp.float32)
        glvl = lvl - ss.grad_level_offset
        mag = extract_patches(ss.grad_mag[o], yx_int, sc.orientation_window, level_idx=glvl)
        ori = extract_patches(ss.grad_ori[o], yx_int, sc.orientation_window, level_idx=glvl)
        outs.append((mag, ori))
    return outs

def with_hist(im):
    ss, dets = base(im)
    outs = []
    win = sc.orientation_window
    for o in range(pc.num_octaves):
        lvl, y, x, off, r, v = dets[o]
        yx_int = jnp.stack([y, x], -1).astype(jnp.float32)
        glvl = lvl - ss.grad_level_offset
        mag = extract_patches(ss.grad_mag[o], yx_int, win, level_idx=glvl)
        ori = extract_patches(ss.grad_ori[o], yx_int, win, level_idx=glvl)
        lvl_f = lvl.astype(jnp.float32) + off[:, 0]
        sig = pc.base_sigma * pc.k_factor ** lvl_f
        w = gaussian_window(win, sc.orientation_sigma_scale * sig)
        hist = soft_histogram(ori.reshape(-1, win*win), (mag*w).reshape(-1, win*win), sc.num_orientation_bins, 360.0, interpolate=True)
        outs.append(histogram_peaks(hist, sc.max_orientations, sc.orientation_peak_ratio, 360.0))
    return outs

f_base = jax.jit(jax.vmap(lambda im: base(im)[1]))
t("pyr+extrema b8", f_base, imgs8)
f_p = jax.jit(jax.vmap(with_patches))
t("+patches b8", f_p, imgs8)
f_h = jax.jit(jax.vmap(with_hist))
t("+hist+peaks b8", f_h, imgs8)

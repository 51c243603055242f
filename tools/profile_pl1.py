"""First TPU compile of the fused analyze+demod kernel.  Order: M=128
standalone (pattern sanity, shapes near the previously-validated
analysis kernel), then M=1024 in-pipeline; numerics vs the XLA path,
then timing."""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import quadrature_demod_planar
from amps_tpu.pallas.rx_front_kernel import analyze_demod_pallas
from amps_tpu.parallel.pipeline import MultichannelSpec, rx_multichannel_block

OUT = open("/root/repo/tools/profile_pl1.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)
def timeit(fn, *a, iters=128):
    r = fn(*a); float(jnp.sum(jnp.asarray(r, jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    float(jnp.sum(jnp.asarray(r, jnp.float32)))
    return (time.perf_counter() - t0) / iters

emit(event="start", device=str(jax.devices()[0]))
rng = np.random.default_rng(0)

# --- stage 1: M=128 standalone, compiled ---
M, T = 256, 8
P = M // 2
Nh = 512
n_ext = (Nh + 2 * T - 1) * P
x = rng.normal(0, 0.5, (n_ext, 2)).astype(np.float32)
emit(event="compile_attempt", M=M)
d, p = analyze_demod_pallas(jnp.asarray(x), M, T, tile_h=128)
d = np.asarray(d, np.float32); p = np.asarray(p)
h = jnp.asarray(chz.prototype_taps(M, T))
ypl = chz._analyze_block_chmajor(jnp.asarray(x), h, M, T, jnp.int32(0),
                                 planar=True)
wd, _, wp = quadrature_demod_planar(ypl[0], ypl[1], return_power=True)
err_d = float(np.abs(d - np.asarray(wd)).max())
err_p = float(np.abs(p - np.asarray(wp)).max() / np.abs(np.asarray(wp)).max())
emit(event="m_small_ok", err_demod=err_d, err_power_rel=err_p)

# --- stage 2: M=1024 in-pipeline ---
M = 1024
emit(event="compile_attempt", M=M)
n = 1 << 22
xw = jnp.asarray(rng.normal(0, 0.1, (n, 2)).astype(np.float32))
spec = MultichannelSpec(num_channels=M, taps_per_phase=8, fold="bank",
                        io_bf16=True, corr_bf16=True)
rp = rx_multichannel_block(xw, spec, max_bursts=2, use_pallas=True)
rx = rx_multichannel_block(xw, spec, max_bursts=2, use_pallas=False)
qd = float(np.abs(np.asarray(rp["quality"], np.float32)
                  - np.asarray(rx["quality"], np.float32)).max())
sd = int(np.abs(np.asarray(rp["starts"]) - np.asarray(rx["starts"])).max())
pw = float(np.abs(np.asarray(rp["chan_power"]) - np.asarray(rx["chan_power"])
                  ).max() / np.abs(np.asarray(rx["chan_power"])).max())
emit(event="m1024_numerics", quality_maxdiff=qd, starts_maxdiff=sd,
     power_reldiff=pw)

def runp(xb):
    return rx_multichannel_block(xb, spec, max_bursts=2,
                                 use_pallas=True)["quality"]
def runx(xb):
    return rx_multichannel_block(xb, spec, max_bursts=2,
                                 use_pallas=False)["quality"]
dtp = timeit(runp, xw)
dtx = timeit(runx, xw)
emit(event="rx_full", M=M, pallas_ms=dtp * 1e3, xla_ms=dtx * 1e3,
     pallas_msps=n / dtp / 1e6, xla_msps=n / dtx / 1e6)
emit(event="done")

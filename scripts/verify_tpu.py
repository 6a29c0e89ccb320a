import numpy as np, time
import jax, jax.numpy as jnp
import meshlessmultigridpoisson_tpu
from meshlessmultigridpoisson_tpu.utils.jaxutils import on_cpu

with on_cpu():
    from meshlessmultigridpoisson_tpu.models.poisson import make_poisson_problem, l1_error
    from meshlessmultigridpoisson_tpu.mg.vcycle import v_cycle, run_v_cycles, init_state
    prob = make_poisson_problem("square", sizes=[600, 2500], poly_deg=4, k1=1,
                                neumann=False, block_rows=128, ordering="kd")
    state_cpu, hist_cpu = run_v_cycles(prob.hierarchy, prob.state0, 15)
    print("cpu resid:", np.asarray(hist_cpu)[[0,5,14]], flush=True)

from meshlessmultigridpoisson_tpu.mg.tpu_backend import tpu_hierarchy
from meshlessmultigridpoisson_tpu.utils.jaxutils import to_device_tree
dev = jax.devices()[0]
thier = jax.device_put(tpu_hierarchy(prob.hierarchy), dev)
state32 = jax.device_put(to_device_tree(prob.state0, dtype=jnp.float32), dev)

from functools import partial
from meshlessmultigridpoisson_tpu.mg.vcycle import run_v_cycles as rvc
t0=time.time()
state_t, hist_t = rvc(thier, state32, 15)
h = np.asarray(hist_t)
print(f"tpu resid ({time.time()-t0:.0f}s incl compile):", h[[0,5,14]], flush=True)
x_cpu = np.asarray(state_cpu.x[-1])
x_tpu = np.asarray(state_t.x[-1])
print("sol diff tpu-vs-cpu:", np.abs(x_tpu - x_cpu).max(), " scale", np.abs(x_cpu).max(), flush=True)
# timing per cycle
t0=time.perf_counter()
state_t2, _ = rvc(thier, state32, 15)
np.asarray(state_t2.x[-1][:4])
print(f"tpu 15 cycles: {(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

# assertions (script form of the TPU e2e test; run on a TPU host)
assert np.abs(np.asarray(hist_t) - np.asarray(hist_cpu)).max() < 1e-4
assert np.abs(x_tpu - x_cpu).max() < 1e-4 * max(1.0, np.abs(x_cpu).max())
print("TPU e2e V-cycle verification PASSED")

"""Split formation stage s0: srb_discrete vs stance_selectors vs build_x0.

Finding: each function alone measures ~3 ms at n_reps=8 — including the
trivial build_x0 — which exposed that the harness floor is the axon
tunnel's FIXED ~23 ms per-call transport divided by n_reps, not device
time (n_reps=1: 23.4 ms; n_reps=64: 0.37 ms/rep for the same body). The
device cost of all three functions together is ~0.4 ms. This led to the
bench.py rep-count fix (transport amortized to <2% per lane)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from quadruped_ctrl_tpu.config import default_config
from quadruped_ctrl_tpu.mpc import formation, pipeline


def timed(fn, inputs, n_reps=8):
    def body(inp, _):
        probe = fn(inp)
        inp = inp.replace(v_world=inp.v_world + 1e-12 * jnp.mean(probe))
        return inp, None

    def chained(inp):
        inp, _ = lax.scan(body, inp, None, length=n_reps)
        return jnp.sum(inp.v_world)

    jf = jax.jit(chained)
    np.asarray(jf(inputs))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jf(inputs))
        ts.append(time.perf_counter() - t0)
    return min(ts) / n_reps


def main():
    cfg = default_config()
    batch, h, ms = 4096, 10, 2
    inputs = pipeline.random_inputs(jax.random.PRNGKey(0), batch, h)

    def s(x):
        return jnp.sum(x, tuple(range(1, x.ndim)))

    def f_srb(inp):
        adt, bdt = formation.srb_discrete(
            cfg.mpc, inp.r_feet, inp.rpy[:, 2], inp.x_drag, cfg.dt_mpc)
        return s(adt) + s(bdt)

    def f_sel(inp):
        fi, gr, sel = formation.stance_selectors(inp.gait_table, ms)
        return s(sel) + s(gr)

    def f_x0(inp):
        x0 = formation.build_x0(
            inp.rpy, inp.position, inp.omega_world, inp.v_world,
            cfg.mpc.gravity)
        return s(x0)

    for name, fn in (("srb_discrete", f_srb), ("stance_selectors", f_sel),
                     ("build_x0", f_x0)):
        print(f"# {name}: {timed(fn, inputs)*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Example: inverse problem — recover physical parameters by gradient
descent THROUGH the PDE solve.

No reference counterpart exists (or could: the C++/MPI/SUNDIALS stack is not
differentiable). Here the whole fixed-step solver is a pure JAX function, so
jax.value_and_grad gives exact sensitivities of any objective with respect
to the kinetics parameter beta AND the diffusion coefficient, and optax
fits both jointly to a target final field.

    python examples/fit_beta.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import optax

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.core.problem import build_problem
from crdmodel_tpu.differentiable import make_differentiable, make_forward_fn


def main():
    cfg = SimConfig(model="fhn", surface="torus", x_mesh=64,
                    surface_width=20, surface_length=40,
                    t_final=0.5, output_timestep=1, beta=1.25,
                    dtype="float32", rtol=1e-5, atol=1e-8)

    # synthesize a "measured" field from hidden true parameters
    true_beta, true_dscale = 1.4, 0.8
    p = build_problem(dataclasses.replace(cfg, beta=true_beta))
    fwd = jax.jit(make_forward_fn(p, n_steps=256))
    y0 = p.y0
    target = fwd({"b": p.params["b"],
                  "dscale": jnp.asarray(true_dscale, jnp.float32)}, y0)

    sim = make_differentiable(
        cfg, n_steps=256,
        loss_fn=lambda y: jnp.mean((y - target) ** 2), problem=p)

    theta = {"b": jnp.asarray(1.1, jnp.float32),
             "dscale": jnp.asarray(1.0, jnp.float32)}
    opt = optax.adam(3e-2)
    state = opt.init(theta)

    @jax.jit
    def opt_step(theta, state):
        loss, g = sim.value_and_grad(theta, y0)
        updates, state = opt.update(g, state)
        return optax.apply_updates(theta, updates), state, loss

    for i in range(120):
        theta, state, loss = opt_step(theta, state)
        if i % 20 == 0:
            print(f"iter {i:3d}: loss={float(loss):.3e} "
                  f"beta={float(theta['b']):.4f} "
                  f"D/D0={float(theta['dscale']):.4f}")
    print(f"recovered beta={float(theta['b']):.4f} (true {true_beta}), "
          f"D/D0={float(theta['dscale']):.4f} (true {true_dscale})")
    assert abs(float(theta["b"]) - true_beta) < 0.02
    assert abs(float(theta["dscale"]) - true_dscale) < 0.05


if __name__ == "__main__":
    main()

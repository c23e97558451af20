"""XLA speculative batching: equivalence with the per-step loop (CPU)."""

import numpy as np
import pytest

from crdmodel_tpu.config import SimConfig
from crdmodel_tpu.sim import simulate


def _cfg(**kw):
    base = dict(model="fhn", surface="torus", x_mesh=16, surface_width=20,
                surface_length=40, beta=1.25, t_final=2.0, output_timestep=2,
                t_boundary=0.7, dtype="float64", rtol=1e-6, atol=1e-10)
    base.update(kw)
    return SimConfig(**base)


@pytest.mark.parametrize("K", [2, 4, 8])
def test_speculative_matches_per_step(K):
    res_k = simulate(_cfg(speculative_k=K))
    res_1 = simulate(_cfg())
    assert res_k.ok and res_1.ok
    # different h sequences -> agreement at integrator-tolerance level
    np.testing.assert_allclose(np.asarray(res_k.trajectory),
                               np.asarray(res_1.trajectory),
                               rtol=1e-4, atol=1e-5)
    s_k = res_k.total_steps()
    s_1 = res_1.total_steps()
    # frozen-h batches cost some extra steps, bounded
    assert s_k < 2.0 * s_1, (s_k, s_1)  # tiny runs pay h-ramp quantization
    # rejections stay rare with the conservative growth cap
    rej = int(np.sum(np.asarray(res_k.stats.rejected)))
    assert rej < 0.15 * s_k, (rej, s_k)


def test_speculative_goldbeter_flat():
    cfg = SimConfig(model="goldbeter", surface="flat", x_mesh=12,
                    surface_width=20, surface_length=40, beta=0.85,
                    t_final=1.0, output_timestep=2, dtype="float64",
                    rtol=1e-6, atol=1e-10, speculative_k=4)
    res = simulate(cfg)
    assert res.ok
    base = simulate(SimConfig(**{**cfg.__dict__, "speculative_k": 0}))
    np.testing.assert_allclose(np.asarray(res.trajectory),
                               np.asarray(base.trajectory),
                               rtol=1e-4, atol=1e-5)


def test_speculative_with_failure_sticky():
    res = simulate(_cfg(speculative_k=4, max_steps=3))
    assert not res.ok
    status = np.asarray(res.stats.status)
    first_bad = int(np.argmax(status != 0))
    assert np.all(status[first_bad:] != 0)

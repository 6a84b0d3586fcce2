"""Pod-scale shard layout: D=64 virtual devices (subprocess; the main test
process is pinned to 8 devices by conftest).

Checks the obs-balanced contiguous split (SURVEY.md section 7 step 5): all
observations preserved, padding waste ~1x, points round-trip through
unshard_points, and a 64-way prepare psum matches the single-device context.
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import os
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=64"
)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import numpy as np
from bundleadjustment_benchmarks_tpu.parallel import sharded
from bundleadjustment_benchmarks_tpu.utils.synthetic import make_synthetic_problem

problem = make_synthetic_problem(n_cameras=6, n_points=512, obs_per_point=3, seed=5)
mesh = sharded.make_mesh(64)
sp = sharded.shard_problem(problem, mesh)
assert sp.n_shards == 64
w = np.asarray(sp.obs.weights)
assert int(w.sum()) == problem.n_observations, (w.sum(), problem.n_observations)
waste = 64 * sp.obs_per_shard / problem.n_observations
assert waste < 1.35, f"padding waste {waste}"
pts = np.asarray(sharded.unshard_points(sp, sp.state))
np.testing.assert_array_equal(pts, np.asarray(problem.state.points))

prepare, _ = sharded.make_sharded_kernels(sp, mesh, "cholesky")
ctx_sh, energy_sh, lam0_sh = jax.jit(prepare)(sp.state)
from bundleadjustment_benchmarks_tpu.solvers.lm import _prepare
ctx, energy, lam0 = _prepare(problem.state, problem, "cholesky")
np.testing.assert_allclose(float(energy_sh), float(energy), rtol=1e-12)
np.testing.assert_allclose(np.asarray(ctx_sh.U), np.asarray(ctx.U), rtol=1e-9, atol=1e-9)
print("OK64")
"""


@pytest.mark.slow
def test_shard_layout_64_devices():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK64" in out.stdout

"""CLI end-to-end tests (reference driver UX, bundle_adjustment_large.cpp:40-176)."""

import numpy as np

from bundleadjustment_benchmarks_tpu import cli
from bundleadjustment_benchmarks_tpu.io import bal
from bundleadjustment_benchmarks_tpu.utils.synthetic import make_synthetic_problem


def write_synthetic_bal(path, n_cameras=4, n_points=15, seed=0):
    """Write a small synthetic problem in BAL format for CLI tests."""
    rng = np.random.default_rng(seed)
    problem = make_synthetic_problem(
        n_cameras=n_cameras, n_points=n_points, obs_per_point=3, seed=seed
    )
    st = problem.state
    obs = problem.obs
    f = -np.asarray(st.K)[:, 0, 0]
    from bundleadjustment_benchmarks_tpu.ops import rodrigues

    omega = np.asarray(rodrigues.log_rodrigues(st.R))
    ds = bal.BalDataset(
        cam_idx=np.asarray(obs.cam_idx),
        pt_idx=np.asarray(obs.pt_idx),
        measurements=np.asarray(obs.measurements),
        omega=omega,
        translation=np.asarray(st.T),
        focal=f,
        k1=np.asarray(st.k1) / f**2,
        k2=np.asarray(st.k2) / f**4,
        points=np.asarray(st.points),
    )
    bal.write_bal(path, ds)
    return ds


def test_cli_end_to_end(tmp_path, capsys):
    path = str(tmp_path / "tiny.txt")
    write_synthetic_bal(path)
    rc = cli.main([path, "--solver", "cholesky", "--max-iters", "5", "--quiet",
                   "--log-file", str(tmp_path / "run.log")])
    assert rc == cli.RETURN_SUCCESS
    out = capsys.readouterr().out
    assert "N(cameras) = 4" in out
    assert "Mean reprojection error:" in out
    assert "True objective:" in out
    assert "lm.minimize(params) ..." in out
    assert "LM finished with status:" in out


def test_cli_wrong_args(capsys):
    assert cli.main([]) == cli.RETURN_WRONG_INPUT_PARAMS


def test_cli_missing_file(tmp_path, capsys):
    rc = cli.main([str(tmp_path / "nope.txt"), "--quiet",
                   "--log-file", str(tmp_path / "run.log")])
    assert rc == cli.RETURN_WRONG_INPUT_FILE


def test_cli_precision_f32_pure(tmp_path, capsys):
    """--precision f32: the reference's Scalar=float build — pure f32, x64
    off (BASELINE.json config 4 sweep point)."""
    import jax

    path = str(tmp_path / "tiny.txt")
    write_synthetic_bal(path)
    try:
        rc = cli.main([path, "--precision", "f32", "--max-iters", "5",
                       "--quiet", "--drive", "jit",
                       "--log-file", str(tmp_path / "run.log")])
    finally:
        jax.config.update("jax_enable_x64", True)
    assert rc == cli.RETURN_SUCCESS
    out = capsys.readouterr().out
    assert "LM finished with status:" in out


def test_cli_precision_mixed(tmp_path, capsys):
    """--precision mixed = f64 state + df32 geometry + f32 Schur matmuls."""
    path = str(tmp_path / "tiny.txt")
    write_synthetic_bal(path)
    rc = cli.main([path, "--precision", "mixed", "--max-iters", "5",
                   "--quiet", "--drive", "jit",
                   "--log-file", str(tmp_path / "run.log")])
    assert rc == cli.RETURN_SUCCESS
    assert "LM finished with status:" in capsys.readouterr().out


def test_cli_shards(tmp_path, capsys):
    """--shards N wires shard_problem/minimize_sharded (VERDICT item 8);
    the 8-virtual-device CPU mesh stands in for real chips."""
    path = str(tmp_path / "tiny.txt")
    write_synthetic_bal(path, n_cameras=4, n_points=24)
    rc = cli.main([path, "--shards", "4", "--max-iters", "5", "--quiet",
                   "--log-file", str(tmp_path / "run.log")])
    assert rc == cli.RETURN_SUCCESS
    out = capsys.readouterr().out
    assert "LM finished with status:" in out
    assert "Mean reprojection error:" in out


def test_cli_jit_verbose_checkpoint_resume(tmp_path, capsys):
    """--drive jit prints the reference iteration table via the chunked
    drive, checkpoints, and resumes (VERDICT item 7)."""
    path = str(tmp_path / "tiny.txt")
    write_synthetic_bal(path)
    ck = str(tmp_path / "state.ckpt.npz")
    rc = cli.main([path, "--drive", "jit", "--max-iters", "6",
                   "--checkpoint", ck, "--checkpoint-every", "3",
                   "--metrics", str(tmp_path / "m.jsonl"),
                   "--log-file", str(tmp_path / "run.log")])
    assert rc == cli.RETURN_SUCCESS
    out = capsys.readouterr().out
    assert "Backtrack LevMarq" in out
    assert "Accepted" in out
    import os

    assert os.path.exists(ck)
    # Resume: runs from the checkpointed iteration, not from scratch.
    rc = cli.main([path, "--drive", "jit", "--max-iters", "8",
                   "--checkpoint", ck, "--checkpoint-every", "3",
                   "--log-file", str(tmp_path / "run.log")])
    assert rc == cli.RETURN_SUCCESS
    assert "Resuming from" in capsys.readouterr().out

"""tools/train_curriculum.py: stage parsing and command assembly.

The curriculum driver encodes the RESULTS.md stage recipes; these tests pin
the stage-selection grammar and that generated commands stay consistent
with the documented chain (warm-start linkage, device-resident flags).
"""

import os
import subprocess
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, TOOLS)

import train_curriculum as tc  # noqa: E402


def test_parse_ranges_and_lists():
    assert tc.parse_stages("A-F") == ["A", "B", "C", "D", "E", "F"]
    assert tc.parse_stages("A-C,F") == ["A", "B", "C", "F"]
    assert tc.parse_stages("f,g") == ["F", "G"]
    assert tc.parse_stages("B") == ["B"]


def test_parse_rejects_unknown():
    with pytest.raises(SystemExit):
        tc.parse_stages("A-Z")
    with pytest.raises(SystemExit):
        tc.parse_stages("Q")


def test_every_stage_has_dataset_and_train_args():
    for name, spec in tc.STAGES.items():
        assert spec["data"], name
        assert "--n" in spec["dataset"], name
        assert "--epochs" in spec["train"], name


def test_dry_run_chains_warm_starts(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "train_curriculum.py"),
         "--dry_run", "--base_dir", str(tmp_path), "--stages", "A-C"],
        capture_output=True, text=True, check=True,
    ).stdout
    lines = [l for l in out.splitlines() if "demo_train_tpu.py" in l]
    assert len(lines) == 3
    # Stage A trains from scratch; B warm-starts from A; C from B.
    assert "--init_from" not in lines[0]
    assert f"--init_from {tmp_path}/stageA_ckpts" in lines[1]
    assert f"--init_from {tmp_path}/stageB_ckpts" in lines[2]
    # All stages run device-resident with augmentation (the published recipe).
    for l in lines:
        assert "--device_data" in l and "--augment" in l


def test_mid_chain_start_requires_warm_start(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "train_curriculum.py"),
         "--dry_run", "--base_dir", str(tmp_path), "--stages", "F"],
        capture_output=True, text=True,
    )
    assert r.returncode != 0
    assert "warm start" in r.stderr

    # ... unless the previous stage's checkpoints exist.
    os.makedirs(tmp_path / "stageE_ckpts")
    out = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "train_curriculum.py"),
         "--dry_run", "--base_dir", str(tmp_path), "--stages", "F"],
        capture_output=True, text=True, check=True,
    ).stdout
    assert f"--init_from {tmp_path}/stageE_ckpts" in out

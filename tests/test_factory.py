"""Offline data-factory host logic: splitting and failure pruning."""

import os

from texocr_tpu.data.factory.render_data import prune_equations
from texocr_tpu.data.factory.split_data import split_data


def test_split_data_layout(tmp_path):
    master = tmp_path / "master.txt"
    eqs = [f"x + {i}" for i in range(100)]
    master.write_text("\n".join(eqs) + "\n")
    split_data(str(master), (0.8, 0.15, 0.05), str(tmp_path / "out"), 100, seed=1)

    seen_labels, seen_ids = [], []
    sizes = {}
    for split in ("train", "test", "val"):
        d = tmp_path / "out" / split
        labels = (d / "labels.txt").read_text().splitlines()
        ids = (d / "ids.txt").read_text().splitlines()
        assert len(labels) == len(ids)
        sizes[split] = len(labels)
        seen_labels += labels
        seen_ids += ids
    assert sizes == {"train": 80, "test": 15, "val": 5}
    # Shuffle is a permutation: every equation lands in exactly one split,
    # and ids were assigned BEFORE the shuffle (reference split_data.py:28-35):
    # id eq_N corresponds to master line N-1.
    assert sorted(seen_labels) == sorted(eqs)
    assert len(set(seen_ids)) == 100
    for label, id_ in zip(seen_labels, seen_ids):
        n = int(id_[3:-4])
        assert eqs[n - 1] == label


def test_split_caps_at_num_equations(tmp_path):
    master = tmp_path / "master.txt"
    master.write_text("\n".join(f"eq {i}" for i in range(50)) + "\n")
    split_data(str(master), (0.8, 0.15, 0.05), str(tmp_path / "out"), 20,
               seed=1, verbose=False)
    total = sum(
        len((tmp_path / "out" / s / "labels.txt").read_text().splitlines())
        for s in ("train", "test", "val")
    )
    assert total == 20


def test_prune_equations(tmp_path):
    d = tmp_path
    (d / "ids.txt").write_text("eq_1.png\neq_2.png\neq_3.png")
    (d / "labels.txt").write_text("a\nb\nc")
    (d / "failed.txt").write_text("eq_2: b\n")
    prune_equations(str(d))
    assert (d / "ids_pruned.txt").read_text().splitlines() == [
        "eq_1.png", "eq_3.png"
    ]
    assert (d / "labels_pruned.txt").read_text().splitlines() == ["a", "c"]


def test_prune_noop_without_failures(tmp_path):
    (tmp_path / "ids.txt").write_text("eq_1.png")
    (tmp_path / "labels.txt").write_text("a")
    prune_equations(str(tmp_path))
    assert not (tmp_path / "ids_pruned.txt").exists()


def test_telemetry_metrics_logger(tmp_path, capsys):
    import json

    from texocr_tpu.telemetry import MetricsLogger, step_timer

    log = MetricsLogger(str(tmp_path / "m.jsonl"), echo=True)
    log.log("train_step", loss=1.5, step=3)
    log.close()
    line = json.loads((tmp_path / "m.jsonl").read_text().splitlines()[0])
    assert line["event"] == "train_step" and line["loss"] == 1.5
    assert json.loads(capsys.readouterr().out.splitlines()[0])["step"] == 3

    holder = {}
    with step_timer(holder):
        pass
    assert holder["seconds"] >= 0

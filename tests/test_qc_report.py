"""Ranked QC report + file-moving split semantics.

Parity: DataPreparation/QualityCheck.py:54-79 (ranked report, worst
first) and Copy.py:9-36 (threshold-based Train->Test file moves).
"""
import numpy as np

from pointcloudregistration_tpu.pipelines import dataprep


def _record(n=6):
    rng = np.random.default_rng(0)
    avg = np.array([0.1, 0.9, 0.3, 0.05, 0.7, 0.2], np.float32)[:n]
    return {
        "qc_hausdorff": avg * 1.5,
        "qc_chamfer": avg * 0.5,
        "qc_average": avg,
        "is_train": avg <= 0.5,
        "source": rng.normal(size=(n, 16, 3)).astype(np.float32),
        "target": rng.normal(size=(n, 16, 3)).astype(np.float32),
        "transformation": np.tile(np.eye(4, dtype=np.float32), (n, 1, 1)),
    }


def test_qc_report_ranked_worst_first(tmp_path):
    rec = _record()
    path = str(tmp_path / "report.csv")
    df = dataprep.qc_report(rec, path)
    assert (tmp_path / "report.csv").exists()
    avgs = df["Average"].to_numpy()
    assert np.all(np.diff(avgs) <= 0)            # descending rank
    assert int(df.iloc[0]["SampleNo"]) == 1      # worst sample leads
    assert set(df.columns) >= {"SampleNo", "Hausdorff Distance",
                               "Chamfer Distance", "Average"}


def test_materialize_split_and_move_outliers(tmp_path):
    rec = _record()
    root = str(tmp_path)
    out = dataprep.materialize_split(rec, root)
    assert len(out["train"]) == int(rec["is_train"].sum())
    assert len(out["test"]) == int((~rec["is_train"]).sum())
    loaded = np.load(out["train"][0])
    assert loaded["source"].shape == (16, 3)

    # Now pretend all samples start in Train/ and the report moves outliers
    # (the Copy.py flow): drop everything into Train first.
    import shutil
    for p in out["test"]:
        shutil.move(p, str(tmp_path / "Train" / p.split("/")[-1]))
    report = str(tmp_path / "report.csv")
    dataprep.qc_report(rec, report)
    moved = dataprep.move_outliers(report, threshold=0.5,
                                   train_dir=str(tmp_path / "Train"),
                                   test_dir=str(tmp_path / "Test"))
    assert len(moved) == 2                        # averages 0.9 and 0.7
    names = sorted(m.split("/")[-1] for m in moved)
    assert names == ["sample_001.npz", "sample_004.npz"]
    # idempotent: nothing left to move
    assert dataprep.move_outliers(report, 0.5, str(tmp_path / "Train"),
                                  str(tmp_path / "Test")) == []

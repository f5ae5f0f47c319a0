"""Multi-dataset evaluation table (SURVEY.md §2.1 eval row, [B] config 5:
the reference's eval story is a PSNR *table* over Kodak/BSD68/Set14).

Drives the real CLIs end to end: a tiny training run, then evaluate over
two datasets (repeated flag + comma list) and check the combined JSON/table.
"""

import json

import pytest


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from ssdn_tpu.cli.train import main as train_main

    wd = tmp_path_factory.mktemp("evalcli")
    train_main([
        "--workdir", str(wd), "--train-data", "synthetic:8:64",
        "--eval-data", "synthetic:2:64", "--iterations", "4",
        "--batch-size", "2", "--patch-size", "32",
        "--eval-interval", "0", "--snapshot-interval", "4",
        "--log-interval", "0",
    ])
    return wd


def test_multi_dataset_table_json(workdir, tmp_path, capsys):
    from ssdn_tpu.cli.evaluate import main as eval_main

    out = tmp_path / "table.json"
    eval_main([
        "--workdir", str(workdir),
        "--dataset", "synthetic:2:64",
        "--dataset", "synthetic:3:64,synthetic:1:64",
        "--json-out", str(out),
    ])
    text = capsys.readouterr().out
    assert "PSNR table" in text
    payload = json.loads(out.read_text())
    table = payload["table"]
    assert set(table) == {"synthetic:2:64", "synthetic:3:64", "synthetic:1:64"}
    assert table["synthetic:3:64"]["n_images"] == 3
    for row in table.values():
        assert row["psnr_mean"] > 0 and row["noisy_psnr_mean"] > 0
    # per-image detail preserved per dataset
    assert len(payload["datasets"]["synthetic:1:64"]["psnr_per_image"]) == 1


def test_single_dataset_json_backward_compatible(workdir, tmp_path):
    from ssdn_tpu.cli.evaluate import main as eval_main

    out = tmp_path / "single.json"
    eval_main([
        "--workdir", str(workdir),
        "--dataset", "synthetic:2:64",
        "--json-out", str(out),
    ])
    payload = json.loads(out.read_text())
    # single-dataset payload keeps the flat round-1 schema
    assert "psnr_mean" in payload and "psnr_per_image" in payload


def test_batched_eval_matches_per_image(workdir):
    """eval_batch > 1 groups same-shaped images into one forward; per-image
    math is identical, so PSNRs must match the unbatched path closely."""
    import numpy as np

    from ssdn_tpu.data import open_dataset
    from ssdn_tpu.infer import evaluate_dataset
    from ssdn_tpu.train.loop import load_config
    from ssdn_tpu.train.step import init_state

    cfg = load_config(str(workdir))
    params = init_state(cfg).params
    ds = open_dataset("synthetic:5:64")
    a = evaluate_dataset(cfg, params, ds, eval_batch=1)
    b = evaluate_dataset(cfg, params, ds, eval_batch=3)
    np.testing.assert_allclose(a["psnr_per_image"], b["psnr_per_image"],
                               atol=1e-3)
    assert b["n_images"] == 5

"""tools/plot_metrics.py: metrics.jsonl -> PNG small multiples."""

import json


def test_plot_metrics_renders(tmp_path):
    from vae_npvc_tpu.utils.plot_metrics import main

    rows = [
        {"iter": 100, "split": "train", "Total": 9.0, "X like": 8.9,
         "frames_per_sec": 1000.0},
        {"iter": 200, "split": "train", "Total": 8.0, "X like": 7.9,
         "frames_per_sec": 1100.0},
        {"iter": 200, "split": "valid", "best_iter": 200, "Total": 8.1,
         "X like": 8.0},
    ]
    mfile = tmp_path / "metrics.jsonl"
    mfile.write_text("".join(json.dumps(r) + "\n" for r in rows))
    main([str(mfile)])
    png = tmp_path / "metrics.png"
    assert png.exists() and png.stat().st_size > 10_000

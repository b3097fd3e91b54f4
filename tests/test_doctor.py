"""vae-npvc-doctor environment self-check (bin/doctor.py).

The doctor must (a) pass on a healthy host, (b) report a wedged accelerator
as a deadline miss instead of hanging with it, and (c) drive the optional
model check off a reference-shaped YAML. No reference counterpart
(operational tooling).
"""

import json

import yaml

from tests.toy_config import toy_config
from vae_npvc_tpu.bin import doctor


def test_doctor_ok(capsys, tmp_path):
    cfg = tmp_path / "conf.yaml"
    cfg.write_text(yaml.safe_dump(toy_config()))
    rc = doctor.main(["--config", str(cfg), "--timeout", "600", "--json"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0, out
    assert out["ok"] is True
    for name in ("imports", "platform", "devices", "cpu-fallback",
                 "compile-cache", "model"):
        assert out["checks"][name]["status"] in ("ok", "warn"), \
            out["checks"][name]
    assert " params" in out["checks"]["model"]["detail"]


def test_doctor_reports_wedged_probe_instead_of_hanging(monkeypatch, capsys):
    import time as _time

    def hang():
        _time.sleep(3600)

    monkeypatch.setattr(doctor, "_device_probe", hang)
    rc = doctor.main(["--timeout", "0.5", "--json"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert out["ok"] is False
    assert out["checks"]["devices"]["status"] == "FAIL"
    assert "timed out" in out["checks"]["devices"]["detail"]
    # later device-touching checks must be skipped, not block on the same
    # backend lock and burn --timeout each with a misleading cascade (ADVICE
    # r3): triage points at the transport only
    assert out["checks"]["cpu-fallback"]["status"] == "skip"
    assert "wedged" in out["checks"]["cpu-fallback"]["detail"]


def test_doctor_bundle_check(capsys, tmp_path):
    import numpy as np

    from vae_npvc_tpu.infer.export_serving import export_bundle
    from vae_npvc_tpu.train.trainer import Trainer

    cfg = toy_config()
    tr = Trainer(cfg)
    rng = np.random.default_rng(0)
    batch = (rng.normal(size=(2, 32, 10)).astype(np.float32),
             np.zeros((2,), np.int32))
    tr.init_state(batch)
    ck = tmp_path / "m.ckpt"
    tr.save_checkpoint(ck)
    export_bundle(cfg, ck, tmp_path / "bundle", buckets=[32], batch_size=2,
                  platforms=("cpu",))

    rc = doctor.main(["--bundle", str(tmp_path / "bundle"),
                      "--timeout", "600", "--json"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0, out
    assert out["checks"]["bundle"]["status"] == "ok"
    assert "1 bucket(s)" in out["checks"]["bundle"]["detail"]

    rc = doctor.main(["--bundle", str(tmp_path / "nosuch"),
                      "--timeout", "600", "--json"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert out["checks"]["bundle"]["status"] == "FAIL"


def test_doctor_human_output(capsys):
    rc = doctor.main(["--timeout", "600"])
    text = capsys.readouterr().out
    assert rc == 0
    assert "devices" in text and "compile-cache" in text

"""eval/rtf.py conversion RTF harness — smoke coverage.

Pins the harness to the Converter's jitted-infer contract (the README RTF
numbers are produced with it), so API drift in infer/convert.py can't
bit-rot the measurement path silently.
"""

import numpy as np

from tests.toy_config import toy_config
from vae_npvc_tpu.eval.rtf import measure_rtf
from vae_npvc_tpu.infer.convert import Converter
from vae_npvc_tpu.train.trainer import Trainer


def test_measure_rtf_toy(tmp_path):
    rng = np.random.default_rng(0)
    cfg = toy_config()
    batch = (rng.normal(size=(4, 16, 10)).astype(np.float32),
             rng.integers(0, 3, size=(4,)).astype(np.int32))
    tr = Trainer(cfg)
    tr.init_state(batch)
    tr.train_step(batch)
    ck = tmp_path / "m.ckpt"
    tr.save_checkpoint(ck)

    cv = Converter(cfg)
    cv.load_checkpoint(ck)

    feats = rng.normal(size=(2, 32, 10)).astype(np.float32)
    lengths = np.array([32, 20], np.int32)
    targets = np.array([1, 2], np.int32)
    rtf, fps = measure_rtf(cv, feats, lengths, targets,
                           frame_rate_hz=93.75, warmup=1, repeats=2)
    assert np.isfinite(rtf) and rtf > 0
    assert np.isfinite(fps) and fps > 0
    # identity: rtf * fps == frame_rate (both derive from the same dt and
    # the true unpadded frame count)
    np.testing.assert_allclose(rtf * fps, 93.75, rtol=1e-6)

"""Speaker-similarity eval: embedder separates synthetic speakers."""

import numpy as np
import pytest

from vae_npvc_tpu.data import kaldi_io
from vae_npvc_tpu.eval.similarity import (cosine_similarity_report, embed_scp,
                                          train_embedder)


@pytest.fixture(scope="module")
def spk_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("sim")
    rng = np.random.default_rng(0)
    S, D = 3, 10
    offsets = rng.normal(size=(S, 1, D)).astype(np.float32) * 3
    with kaldi_io.ArkWriter(root / "f.ark", root / "feats.scp") as w, \
            open(root / "utt2num_frames", "w") as unf, \
            open(root / "utt2spk_id", "w") as u2s:
        for i in range(30):
            spk = i % S
            T = int(rng.integers(20, 40))
            mat = rng.normal(size=(T, D)).astype(np.float32) * 0.5 + offsets[spk]
            w.write(f"u{i:02d}", mat)
            unf.write(f"u{i:02d} {T}\n")
            u2s.write(f"u{i:02d} {spk}\n")
    return root, offsets


def test_similarity_pipeline(spk_data):
    root, offsets = spk_data
    cfg = {"crop_length": 24, "use_native_loader": False}
    model, params = train_embedder(root, cfg, steps=150, batch_size=16,
                                   log_every=0)
    embs = embed_scp(model, params, root / "feats.scp")
    assert len(embs) == 30
    u2s = kaldi_io.load_dict_data(root / "utt2spk_id")
    # same-speaker embeddings are closer than cross-speaker
    same, cross = [], []
    utts = sorted(embs)
    for i, a in enumerate(utts):
        for b in utts[i + 1:]:
            (same if u2s[a] == u2s[b] else cross).append(
                float(np.dot(embs[a], embs[b])))
    assert np.mean(same) > np.mean(cross) + 0.2, (np.mean(same),
                                                  np.mean(cross))

    # cosine report: trials targeting the utterance's TRUE speaker score
    # higher than trials targeting a wrong speaker
    good = {u: u2s[u] for u in utts[:9]}
    bad = {u: str((int(u2s[u]) + 1) % 3) for u in utts[:9]}
    m_good, _ = cosine_similarity_report(embs, embs, good, u2s)
    m_bad, _ = cosine_similarity_report(embs, embs, bad, u2s)
    assert m_good > m_bad


def test_plda_similarity_report(spk_data):
    """PLDA trained on the embedder's outputs ranks true targets higher."""
    from vae_npvc_tpu.eval.plda import plda_train
    from vae_npvc_tpu.eval.similarity import (plda_similarity_report,
                                              write_scores)

    root, _ = spk_data
    cfg = {"crop_length": 24, "use_native_loader": False}
    model, params = train_embedder(root, cfg, steps=150, batch_size=16,
                                   log_every=0)
    embs = embed_scp(model, params, root / "feats.scp")
    u2s = kaldi_io.load_dict_data(root / "utt2spk_id")
    utts = sorted(embs)
    plda = plda_train(np.stack([embs[u] for u in utts]),
                      [u2s[u] for u in utts])
    good = {u: u2s[u] for u in utts[:9]}
    bad = {u: str((int(u2s[u]) + 1) % 3) for u in utts[:9]}
    m_good, per_utt = plda_similarity_report(plda, embs, embs, good, u2s)
    m_bad, _ = plda_similarity_report(plda, embs, embs, bad, u2s)
    assert m_good > m_bad

    # scores-file shape: $3 of the tail line is the mean (reference grep)
    write_scores(root / "plda_scores", "0", per_utt, m_good)
    tail = (root / "plda_scores").read_text().splitlines()[-1].split()
    assert tail[1] == "Mean" and float(tail[2]) == pytest.approx(m_good,
                                                                 abs=1e-4)


def test_tdnn_arch_and_ckpt_roundtrip(spk_data, tmp_path):
    """Default embedder is the SITW-architecture TDNN (5 dilated frame
    layers + stats pooling + 2 segment layers, reference
    evaluate_similarity.sh:54-64 downloads exactly this net shape); the
    checkpoint cache reloads to identical embeddings."""
    import jax

    from vae_npvc_tpu.eval.similarity import load_embedder

    root, _ = spk_data
    cfg = {"crop_length": 24, "use_native_loader": False}
    ckpt = tmp_path / "emb.msgpack"
    model, params = train_embedder(root, cfg, steps=60, batch_size=16,
                                   log_every=0, width=32, ckpt=str(ckpt))
    # frame stack present, with the 3x-width frame5 layer
    names = set(params.keys())
    assert {"tdnn_0", "tdnn_1", "tdnn_2", "tdnn_3", "tdnn_4",
            "embed", "segment7", "classify"} <= names
    assert params["tdnn_4"]["kernel"].shape[-1] == 96  # 3 * width

    embs = embed_scp(model, params, root / "feats.scp")
    model2, params2 = train_embedder(root, cfg, steps=60, batch_size=16,
                                     log_every=0, width=32, ckpt=str(ckpt))
    embs2 = embed_scp(model2, params2, root / "feats.scp")
    for u in embs:
        np.testing.assert_allclose(embs[u], embs2[u], atol=1e-6)


def test_legacy_conv3_arch_still_available(spk_data):
    root, _ = spk_data
    cfg = {"crop_length": 24, "use_native_loader": False}
    model, params = train_embedder(root, cfg, steps=40, batch_size=16,
                                   log_every=0, arch="conv3")
    assert "conv_0" in params and "tdnn_0" not in params

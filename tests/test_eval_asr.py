"""Objective-eval subsystem: sclite-semantics scorer, PLDA, CTC proxy ASR."""

import numpy as np
import pytest

from vae_npvc_tpu.eval import wer as wer_mod
from vae_npvc_tpu.eval.plda import plda_train, plda_score


class TestWer:
    def test_align_counts(self):
        c = wer_mod.align("a b c d".split(), "a x c".split())
        assert (c.corr, c.sub, c.dele, c.ins) == (2, 1, 1, 0)
        assert c.n_ref == 4
        assert c.err_pct == 50.0

    def test_insertions(self):
        c = wer_mod.align("a b".split(), "a x b y".split())
        assert (c.corr, c.sub, c.dele, c.ins) == (2, 0, 0, 2)
        assert c.err_pct == 100.0

    def test_empty_hyp_is_all_deletions(self):
        total, s_err, per_utt = wer_mod.score({"u1": "a b c"}, {}, "word")
        assert total.dele == 3 and total.err_pct == 100.0 and s_err == 1

    def test_char_level_strips_spaces(self):
        total, _, _ = wer_mod.score({"u": "ab cd"}, {"u": "abcd"}, "char")
        assert total.err_pct == 0.0

    def test_report_field_11_is_err_pct(self, tmp_path):
        """The reference greps Err% as awk field 11 (test.sh:19-20)."""
        refs = {"u1": "a b c d", "u2": "e f"}
        hyps = {"u1": "a b c d", "u2": "e x"}
        p = tmp_path / "result.txt"
        total = wer_mod.write_report(p, refs, hyps, "word")
        line = [ln for ln in p.read_text().splitlines()
                if "Sum/Avg" in ln][0]
        field11 = line.split()[10]
        assert float(field11) == pytest.approx(total.err_pct, abs=0.05)


class TestPlda:
    @staticmethod
    def _toy_embeddings(n_spk=8, n_utt=20, dim=16, seed=0):
        rng = np.random.default_rng(seed)
        centers = rng.normal(size=(n_spk, dim)) * 3.0
        embs, labels = [], []
        for s in range(n_spk):
            embs.append(centers[s] + rng.normal(size=(n_utt, dim)))
            labels += [s] * n_utt
        return np.concatenate(embs), np.array(labels), centers, rng

    def test_same_speaker_scores_higher(self):
        embs, labels, centers, rng = self._toy_embeddings()
        plda = plda_train(embs, labels)
        dim = embs.shape[1]
        # fresh utterances from speakers 0 and 1
        t0 = centers[0] + rng.normal(size=(dim,))
        t1 = centers[1] + rng.normal(size=(dim,))
        enroll0 = embs[labels == 0].mean(axis=0)
        s_same = plda_score(plda, enroll0, t0, n_enroll=20)
        s_diff = plda_score(plda, enroll0, t1, n_enroll=20)
        assert s_same > s_diff
        assert s_same > 0 > s_diff

    def test_psi_descending_and_within_whitened(self):
        embs, labels, _, _ = self._toy_embeddings()
        plda = plda_train(embs, labels)
        assert np.all(np.diff(plda.psi) <= 1e-9)
        # strong speaker structure => top psi well above 1
        assert plda.psi[0] > 1.0

    def test_more_enrollment_sharpens(self):
        """With more enrollment utterances the same-speaker LLR grows."""
        embs, labels, centers, rng = self._toy_embeddings()
        plda = plda_train(embs, labels)
        enroll0 = embs[labels == 0].mean(axis=0)
        t0 = centers[0] + 0.1 * rng.normal(size=(embs.shape[1],))
        s1 = plda_score(plda, enroll0, t0, n_enroll=1)
        s20 = plda_score(plda, enroll0, t0, n_enroll=20)
        assert s20 > s1


def _char_corpus(tmp_path, n_utts=60, seed=0):
    """Synthetic mel-ish corpus where each char is a distinct 8-frame
    feature template — learnable by the CTC proxy in a few hundred steps."""
    from vae_npvc_tpu.data import kaldi_io

    rng = np.random.default_rng(seed)
    alphabet = "abcd"
    dim = 10
    templates = {c: rng.normal(size=(dim,)) * 2.0 for c in alphabet}
    d = tmp_path / "asr_data"
    d.mkdir()
    texts = {}
    with kaldi_io.ArkWriter(d / "feats.ark", d / "feats.scp") as w, \
            open(d / "text", "w") as tf:
        for i in range(n_utts):
            n_char = int(rng.integers(2, 6))
            text = "".join(rng.choice(list(alphabet), size=n_char))
            frames = []
            for c in text:
                block = templates[c][None, :].repeat(8, axis=0)
                frames.append(block + 0.1 * rng.normal(size=block.shape))
            mat = np.concatenate(frames).astype(np.float32)
            utt = f"utt{i:03d}"
            w.write(utt, mat)
            tf.write(f"{utt} {text}\n")
            texts[utt] = text
    return d, texts


class TestCTC:
    def test_train_and_transcribe(self, tmp_path):
        from vae_npvc_tpu.eval.asr import train_ctc

        d, texts = _char_corpus(tmp_path)
        rec = train_ctc(d, steps=400, batch_size=16, width=48, seed=0,
                        log_every=0)
        hyps = rec.transcribe_scp(d / "feats.scp", batch_size=8, bucket=64)
        total, _, _ = wer_mod.score(texts, hyps, "char")
        assert total.err_pct < 10.0, f"CER {total.err_pct}%"

    def test_transformer_arch_trains_and_roundtrips(self, tmp_path):
        """arch='transformer': the reference eval ASR's architecture family
        (LibriSpeech transformer, evaluate.sh:72-91) learns the corpus and
        survives a save/load with arch+width+blocks inferred from the
        checkpoint; padded batches equal per-utterance decoding."""
        from vae_npvc_tpu.eval.asr import CTCRecognizer, train_ctc

        d, texts = _char_corpus(tmp_path)
        rec = train_ctc(d, steps=400, batch_size=16, width=48, seed=0,
                        log_every=0, arch="transformer")
        assert "blk_0" in rec.params and "conv_0" not in rec.params
        assert "mha" in rec.params["blk_0"]   # shared TransformerBlock
        hyps = rec.transcribe_scp(d / "feats.scp", batch_size=8, bucket=64)
        total, _, _ = wer_mod.score(texts, hyps, "char")
        assert total.err_pct < 10.0, f"CER {total.err_pct}%"

        rec.save(tmp_path / "tctc.msgpack")
        rec2 = CTCRecognizer.load(tmp_path / "tctc.msgpack")
        assert rec2.arch == "transformer"
        h2 = rec2.transcribe_scp(d / "feats.scp", batch_size=8, bucket=64)
        assert hyps == h2

    def test_recognizer_interface_resolution(self):
        from vae_npvc_tpu.eval.asr import CTCRecognizer, get_recognizer

        rec = get_recognizer("vae_npvc_tpu.eval.asr:CTCRecognizer",
                             model=None, params=None, vocab={"a": 1})
        assert isinstance(rec, CTCRecognizer)


class TestCheckpointWidthInference:
    def test_load_infers_width(self, tmp_path):
        """A non-default-width checkpoint loads without the caller having
        to remember --width (shape read from the stored conv kernels)."""
        from vae_npvc_tpu.eval.asr import CTCRecognizer, train_ctc

        d, texts = _char_corpus(tmp_path, n_utts=12)
        rec = train_ctc(d, steps=50, batch_size=8, width=48, seed=0,
                        log_every=0)
        rec.save(tmp_path / "ctc.msgpack")
        rec2 = CTCRecognizer.load(tmp_path / "ctc.msgpack")
        h1 = rec.transcribe_scp(d / "feats.scp", batch_size=4, bucket=64)
        h2 = rec2.transcribe_scp(d / "feats.scp", batch_size=4, bucket=64)
        assert h1 == h2


class PlainRecognizer:
    """Minimal external drop-in: the documented transcribe_scp(scp) shape
    (no decode-knob kwargs) — the CLI must not pass beam/LM args to it."""

    def transcribe_scp(self, scp):
        from vae_npvc_tpu.data import kaldi_io

        return {u: "abcd" for u in kaldi_io.read_scp(scp)}


class TestPluggableRecognizerCLI:
    def test_cli_with_plain_interface(self, tmp_path, monkeypatch, capsys):
        """--recognizer with the documented minimal interface works even
        though the CLI's default decode path uses beam/LM kwargs."""
        import sys

        from vae_npvc_tpu.bin.eval_asr import main

        d, texts = _char_corpus(tmp_path, n_utts=10)
        out = tmp_path / "res"
        monkeypatch.setattr(sys, "argv", [
            "eval_asr", "--recognizer", "test_eval_asr:PlainRecognizer",
            "--eval_scp", str(d / "feats.scp"),
            "--ref_text", str(d / "text"),
            "--output_dir", str(out)])
        main()
        assert "CER:" in capsys.readouterr().out


class TestEvalAsrCLI:
    def test_cli_end_to_end(self, tmp_path, monkeypatch, capsys):
        """Train → transcribe → result.txt/result.wrd.txt greppable."""
        import sys

        from vae_npvc_tpu.bin.eval_asr import main

        d, texts = _char_corpus(tmp_path)
        out = tmp_path / "asr_result"
        ckpt = tmp_path / "ctc.msgpack"
        argv = ["eval_asr", "--train_dir", str(d),
                "--eval_scp", str(d / "feats.scp"),
                "--ref_text", str(d / "text"),
                "--output_dir", str(out),
                "--recognizer_ckpt", str(ckpt),
                "--steps", "400", "--width", "48"]
        monkeypatch.setattr(sys, "argv", argv)
        main()
        printed = capsys.readouterr().out
        assert "CER:" in printed and "WER:" in printed
        assert (out / "result.txt").exists()
        assert (out / "result.wrd.txt").exists()
        line = [ln for ln in (out / "result.txt").read_text().splitlines()
                if "Sum/Avg" in ln][0]
        assert float(line.split()[10]) < 10.0  # CER% on train data

        # second run reuses the checkpoint (no training) and matches
        monkeypatch.setattr(sys, "argv", argv)
        main()
        printed2 = capsys.readouterr().out
        assert "loaded recognizer" in printed2
        assert printed.splitlines()[-1] == printed2.splitlines()[-1]


class TestCharNgramLM:
    def test_distributions_normalize(self):
        from vae_npvc_tpu.eval.lm import EOS, CharNgramLM

        lm = CharNgramLM(["abab", "abba", "ba"], order=3)
        symbols = lm.vocab + [EOS]
        for ctx in ["", "a", "ab", "zz", "abab"]:
            total = sum(lm.prob(list(ctx), c) for c in symbols)
            assert total == pytest.approx(1.0, abs=1e-9), ctx

    def test_seen_bigram_beats_unseen(self):
        from vae_npvc_tpu.eval.lm import CharNgramLM

        lm = CharNgramLM(["ab"] * 20 + ["ac"], order=2)
        assert lm.prob(["a"], "b") > lm.prob(["a"], "c")
        # EOS after a full training sentence is likely
        assert lm.logp_eos(list("ab")) > lm.logp_eos(list("a"))


def _exact_ctc_argmax(log_probs, blank=0):
    """Brute-force exact CTC decode: enumerate all frame paths, sum
    per collapsed output string (the oracle prefix beam search targets)."""
    import itertools

    T, V = log_probs.shape
    post = {}
    for path in itertools.product(range(V), repeat=T):
        lp = sum(log_probs[t, c] for t, c in enumerate(path))
        collapsed, prev = [], blank
        for c in path:
            if c != blank and c != prev:
                collapsed.append(c)
            prev = c
        key = tuple(collapsed)
        post[key] = np.logaddexp(post.get(key, -np.inf), lp)
    return max(post, key=post.get), post


class TestPrefixBeamSearch:
    @staticmethod
    def _rand_logprobs(T, V, seed):
        rng = np.random.default_rng(seed)
        x = rng.normal(size=(T, V)) * 2.0
        return x - np.log(np.exp(x).sum(axis=1, keepdims=True))

    def test_matches_exact_ctc_posterior_argmax(self):
        """Wide beam == exact posterior argmax over collapsed strings."""
        from vae_npvc_tpu.eval.asr import ctc_prefix_beam_search

        for seed in range(6):
            lp = self._rand_logprobs(T=5, V=3, seed=seed)
            exact, _ = _exact_ctc_argmax(lp)
            got = tuple(ctc_prefix_beam_search(lp, beam_size=200))
            assert got == exact, f"seed {seed}: {got} vs {exact}"

    def test_beats_greedy_on_ambiguous_frames(self):
        """The classic CTC case: per-frame argmax is blank everywhere but
        the summed non-blank mass wins — greedy returns empty, prefix
        search returns the character."""
        from vae_npvc_tpu.eval.asr import ctc_prefix_beam_search

        # frame posteriors: blank 0.4, char-1 0.6 split over 2 frames is
        # not ambiguous; make each frame argmax blank but path-sum favor 'a'
        p = np.array([[0.4, 0.6], [0.4, 0.6]])
        lp = np.log(p)
        # greedy collapse of per-frame argmax: [1, 1] -> (1,), fine; instead
        # use blank-max frames: blank 0.6 vs char 0.4 each frame, but the
        # char string "a" collects mass from paths {a-}, {-a}, {aa}
        p = np.array([[0.6, 0.4], [0.6, 0.4]])
        lp = np.log(p)
        exact, post = _exact_ctc_argmax(lp)
        got = tuple(ctc_prefix_beam_search(lp, beam_size=50))
        assert got == exact == (1,)   # P(a)=.4*.6+.6*.4+.4*.4 > P("")=.36
        greedy = ()                    # per-frame argmax is all blanks
        assert got != greedy

    def test_lm_fusion_biases_decode(self):
        """Shallow fusion flips an acoustically ambiguous decision toward
        the LM-preferred continuation (reference lm-weight semantics)."""
        from vae_npvc_tpu.eval.asr import ctc_prefix_beam_search
        from vae_npvc_tpu.eval.lm import CharNgramLM

        id2char = {1: "a", 2: "b", 3: "c"}
        # acoustics: clear 'a', then b/c nearly tied with c slightly ahead
        lp = np.log(np.array([
            [0.05, 0.90, 0.025, 0.025],
            [0.80, 0.10, 0.05, 0.05],
            [0.10, 0.05, 0.41, 0.44],
        ]))
        plain = tuple(ctc_prefix_beam_search(lp, beam_size=20))
        assert plain == (1, 3)  # "ac" without LM
        lm = CharNgramLM(["ab"] * 50, order=2)
        fused = tuple(ctc_prefix_beam_search(
            lp, beam_size=20, lm=lm, lm_weight=0.6, id2char=id2char))
        assert fused == (1, 2)  # "ab" with LM

    def test_insertion_penalty_lengthens(self):
        """A positive per-token bonus favors longer transcripts."""
        from vae_npvc_tpu.eval.asr import ctc_prefix_beam_search

        p = np.array([[0.6, 0.4], [0.6, 0.4]])
        lp = np.log(p)
        short = ctc_prefix_beam_search(lp, beam_size=50, penalty=-2.0)
        long = ctc_prefix_beam_search(lp, beam_size=50, penalty=2.0)
        assert len(short) == 0 and len(long) >= 1

    def test_recognizer_beam_decode(self, tmp_path):
        """End-to-end: beam+LM decode of the trained proxy is at least as
        good as greedy on the template corpus."""
        from vae_npvc_tpu.eval.asr import train_ctc
        from vae_npvc_tpu.eval.lm import CharNgramLM

        d, texts = _char_corpus(tmp_path)
        rec = train_ctc(d, steps=400, batch_size=16, width=48, seed=0,
                        log_every=0)
        lm = CharNgramLM(texts.values(), order=3)
        greedy = rec.transcribe_scp(d / "feats.scp", batch_size=8, bucket=64)
        beam = rec.transcribe_scp(d / "feats.scp", batch_size=8, bucket=64,
                                  beam_size=10, lm=lm, lm_weight=0.3)
        g, _, _ = wer_mod.score(texts, greedy, "char")
        b, _, _ = wer_mod.score(texts, beam, "char")
        assert b.err_pct <= g.err_pct + 1e-9, (b.err_pct, g.err_pct)


class TestSpecAugment:
    def test_masks_within_bounds(self):
        import jax
        import jax.numpy as jnp

        from vae_npvc_tpu.eval.asr import spec_augment

        rng = jax.random.PRNGKey(0)
        feats = jnp.ones((3, 50, 16))
        flens = jnp.array([50, 30, 10])
        out = np.asarray(spec_augment(rng, feats, flens))
        assert out.shape == feats.shape
        assert np.all((out == 0) | (out == 1))
        assert out.sum() < feats.size          # something was masked
        assert out.sum() > feats.size * 0.3    # not everything

    def test_ctc_trains_with_specaug(self, tmp_path):
        from vae_npvc_tpu.eval.asr import train_ctc
        from vae_npvc_tpu.eval import wer as wer_mod

        d, texts = _char_corpus(tmp_path)
        rec = train_ctc(d, steps=400, batch_size=16, width=48, seed=0,
                        log_every=0, specaug=True)
        hyps = rec.transcribe_scp(d / "feats.scp", batch_size=8, bucket=64)
        total, _, _ = wer_mod.score(texts, hyps, "char")
        assert total.err_pct < 20.0, f"CER {total.err_pct}%"


class TestNeuralCharLM:
    """Neural char-LSTM LM (eval/neural_lm.py) — the reference RNNLM analog
    (reference: egs/vcc20/vae1/local/ob_eval/evaluate.sh:84-91 downloads a
    pretrained RNNLM; here it is trained in-framework on corpus text)."""

    def _train(self, texts, steps=250):
        from vae_npvc_tpu.eval.neural_lm import train_char_lm
        return train_char_lm(texts, steps=steps, embed=24, hidden=48,
                             layers=1, seed=0)

    def test_distribution_normalizes_and_learns(self):
        import numpy as np
        lm = self._train(["abab", "ababab", "abababab"] * 4)
        _, logps = lm._state(tuple("aba"))
        assert abs(float(np.exp(logps).sum()) - 1.0) < 1e-4
        # after "aba" the corpus always continues with "b"
        assert lm.logp("aba", "b") > lm.logp("aba", "a") + 0.5

    def test_save_load_roundtrip(self, tmp_path):
        from vae_npvc_tpu.eval.neural_lm import CharLstmLM
        lm = self._train(["hello world", "hello there"] * 4)
        p = tmp_path / "lm.msgpack"
        lm.save(p)
        lm2 = CharLstmLM.load(p)
        for ctx, c in [("hel", "l"), ("hello ", "w"), ("", "h")]:
            assert abs(lm.logp(ctx, c) - lm2.logp(ctx, c)) < 1e-5
        assert abs(lm.logp_eos("hello world") -
                   lm2.logp_eos("hello world")) < 1e-5

    def test_neural_fusion_biases_decode(self):
        """Same shallow-fusion contract as the n-gram: the neural LM flips
        an acoustically ambiguous decision toward its preferred string."""
        import numpy as np
        from vae_npvc_tpu.eval.asr import ctc_prefix_beam_search
        id2char = {1: "a", 2: "b", 3: "c"}
        lp = np.log(np.array([
            [0.05, 0.90, 0.025, 0.025],
            [0.80, 0.10, 0.05, 0.05],
            [0.10, 0.05, 0.41, 0.44],
        ]))
        plain = tuple(ctc_prefix_beam_search(lp, beam_size=20))
        assert plain == (1, 3)  # "ac" without LM
        lm = self._train(["ab"] * 12, steps=300)
        fused = tuple(ctc_prefix_beam_search(
            lp, beam_size=20, lm=lm, lm_weight=1.0, id2char=id2char))
        assert fused == (1, 2)  # "ab" with the neural LM

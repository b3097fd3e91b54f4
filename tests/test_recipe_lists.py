"""Recipe data-list generators: split-boundary fidelity.

The vae1 and vae2 recipes use different VCTK utterance splits (reference
egs/vcc20/vae1/local/generate_vctk_list.py:56-67 vs
egs/vcc20/vae2/local/generate_vctk_list.py:56-60); the generator exposes the
bounds as flags and the vae2 run.sh must pass them.
"""

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
GEN = REPO / "egs/vcc20/vae1/local/generate_vctk_list.py"
VAE2_GEN = REPO / "egs/vcc20/vae2/local/generate_vctk_list.py"
VAE2_RUN = REPO / "egs/vcc20/vae2/run.sh"


def _fake_vctk(root, n_spk=2, n_utt=60):
    for s in range(n_spk):
        d = root / f"p{225 + s}"
        d.mkdir(parents=True)
        for u in range(1, n_utt + 1):
            (d / f"p{225 + s}_{u:03d}.wav").write_bytes(b"RIFF")


def _utt_nums(data_dir, split):
    f = data_dir / split / "wav.scp"
    if not f.exists():
        return set()
    return {int(line.split()[0].rsplit("_", 1)[1])
            for line in f.read_text().splitlines() if line.strip()}


def _run(data_root, list_dir, extra=()):
    subprocess.run(
        [sys.executable, str(GEN), "-d", str(data_root), "-l", str(list_dir),
         "--no-pipe", *extra],
        check=True, capture_output=True)


def test_vae1_default_split(tmp_path):
    root = tmp_path / "vctk"
    _fake_vctk(root)
    _run(root, tmp_path / "lists")
    d = tmp_path / "lists"
    assert _utt_nums(d, "vctk_test") == set(range(1, 26))
    assert _utt_nums(d, "vctk_dev") == set(range(26, 51))
    assert _utt_nums(d, "vctk_train") == set(range(51, 61))


def test_vae2_split_flags(tmp_path):
    root = tmp_path / "vctk"
    _fake_vctk(root)
    _run(root, tmp_path / "lists", ["--test_hi", "0", "--dev_lo", "1"])
    d = tmp_path / "lists"
    # reference vae2: no test utterances, dev = 1-50
    assert _utt_nums(d, "vctk_test") == set()
    assert _utt_nums(d, "vctk_dev") == set(range(1, 51))
    assert _utt_nums(d, "vctk_train") == set(range(51, 61))


def test_vae2_run_sh_passes_split_flags():
    """The recipe must actually request the vae2 boundaries."""
    assert VAE2_GEN.exists()
    text = VAE2_RUN.read_text()
    call = next(line for line in text.splitlines()
                if "generate_vctk_list.py" in line)
    # flags may continue on the next line
    idx = text.splitlines().index(call)
    region = "\n".join(text.splitlines()[idx:idx + 3])
    assert re.search(r"--test_hi\s+0", region)
    assert re.search(r"--dev_lo\s+1", region)

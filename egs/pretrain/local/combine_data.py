#!/usr/bin/env python
"""Combine dumped data dirs with disjoint speaker-id ranges.

BASELINE config 5 (large-batch DP pretrain) trains one model over the
AISHELL-3 and VCC2020/VCTK corpora at once. Each recipe dumps its own data
dir (``feats.scp``/``utt2num_frames``/``utt2spk_id``/``spk2spk_id``) with
speaker ids starting at 0 — concatenating them naively would alias speakers
across corpora. This tool concatenates N dumped dirs while remapping each
dir's speaker ids into a disjoint global range (dir order = range order) and
writes a combined dir usable by ``vae_npvc_tpu.bin.train`` directly.

The feature front-ends must match (the pretrain recipe extracts every corpus
at one shared fs/n_mels — AISHELL-3's native 160-mel recipe front-end is NOT
compatible with VCC2020's 80-mel one); feature dims are verified here via
each dir's first ark record.

No reference counterpart: the reference has no combined-corpus recipe
(BASELINE.json configs list; its egs/ recipes are single-corpus).

Usage:
  python combine_data.py out_dir dir1 dir2 [...] [--prefixes a,b,...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def _read_pairs(path, required=True):
    path = Path(path)
    if not path.exists():
        if required:
            sys.exit(f"combine_data: missing {path}")
        return []
    out = []
    for line in path.read_text().splitlines():
        if line.strip():
            k, v = line.split(maxsplit=1)
            out.append((k, v.strip()))
    return out


def combine(out_dir, in_dirs, prefixes=None):
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if prefixes is None:
        prefixes = [""] * len(in_dirs)
    if len(prefixes) != len(in_dirs):
        sys.exit("combine_data: --prefixes count must match input dirs")

    feats, frames, utt2sid, utt2spk, spk2sid, text = [], [], [], [], {}, []
    seen_utts: set = set()
    offset = 0
    summaries = []
    for d, pref in zip(in_dirs, prefixes):
        d = Path(d)
        local_spk = _read_pairs(d / "spk2spk_id")
        if not local_spk:
            sys.exit(f"combine_data: empty spk2spk_id in {d}")
        local_max = max(int(v) for _, v in local_spk)
        n_range = local_max + 1          # ids are dense from make_spk_id,
        # but remap by offset+id (not re-enumeration) so a dir's internal
        # id gaps survive unchanged
        for spk, sid in local_spk:
            g = pref + spk
            if g in spk2sid:
                sys.exit(f"combine_data: speaker '{g}' appears in multiple "
                         "dirs — disambiguate with --prefixes")
            spk2sid[g] = offset + int(sid)
        for u, v in _read_pairs(d / "feats.scp"):
            if pref + u in seen_utts:
                sys.exit(f"combine_data: utterance '{pref + u}' appears in "
                         "multiple dirs — disambiguate with --prefixes")
            seen_utts.add(pref + u)
            feats.append((pref + u, v))
        frames += [(pref + u, v) for u, v in _read_pairs(d / "utt2num_frames")]
        utt2sid += [(pref + u, str(offset + int(v)))
                    for u, v in _read_pairs(d / "utt2spk_id")]
        utt2spk += [(pref + u, pref + v)
                    for u, v in _read_pairs(d / "utt2spk", required=False)]
        text += [(pref + u, v) for u, v in _read_pairs(d / "text",
                                                       required=False)]
        summaries.append((str(d), len(local_spk), offset,
                          offset + n_range - 1))
        offset += n_range

    # feature-dim compatibility: read each dir's first ark record header
    from vae_npvc_tpu.data import kaldi_io
    dims = {}
    for d in in_dirs:
        first = next(iter(_read_pairs(Path(d) / "feats.scp")))[1]
        dims[str(d)] = kaldi_io.matrix_header(first)[1]
    if len(set(dims.values())) > 1:
        sys.exit(f"combine_data: feature dims differ across dirs: {dims} "
                 "— re-extract every corpus with one shared front-end")

    def write(name, pairs):
        with open(out_dir / name, "w") as f:
            for k, v in pairs:
                f.write(f"{k} {v}\n")

    write("feats.scp", feats)
    write("utt2num_frames", frames)
    write("utt2spk_id", utt2sid)
    if utt2spk:
        write("utt2spk", utt2spk)
    write("spk2spk_id", sorted(spk2sid.items(), key=lambda kv: kv[1]))
    if text:
        write("text", text)

    for d, n_spk, lo, hi in summaries:
        print(f"combine_data: {d}: {n_spk} speakers -> ids [{lo}, {hi}]")
    print(f"combine_data: {out_dir}: {len(feats)} utterances, "
          f"{len(spk2sid)} speakers, max id {offset - 1} "
          f"(set y_num > {offset - 1})")
    return offset


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("out_dir")
    ap.add_argument("in_dirs", nargs="+")
    ap.add_argument("--prefixes", default=None,
                    help="comma-separated utterance/speaker name prefixes, "
                         "one per input dir (avoids cross-corpus collisions)")
    args = ap.parse_args(argv)
    prefixes = args.prefixes.split(",") if args.prefixes else None
    combine(args.out_dir, args.in_dirs, prefixes)


if __name__ == "__main__":
    main()

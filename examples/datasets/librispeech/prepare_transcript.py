"""Build a LibriSpeech TSV manifest from the extracted dataset tree.

Counterpart of the reference
``examples/datasets/librispeech/prepare_transcript.py`` (file:1-56): walk a
LibriSpeech split directory for ``*.trans.txt`` / ``*.txt`` transcript files
(each line ``<utt-id> <TEXT>``), locate the sibling ``<utt-id>.flac``, stamp
its duration, NFKC-normalize + lowercase the text, and write the
``PATH\tDURATION\tTRANSCRIPT`` manifest our datasets consume
(``tensorflowasr_tpu/data/datasets.py``). Durations come from the FLAC
STREAMINFO header (no decode) instead of ``librosa.get_duration``.

Usage:
  python prepare_transcript.py --directory LibriSpeech/train-clean-100 \
      --output train.tsv
"""

from __future__ import annotations

import argparse
import glob
import os
import unicodedata


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--directory", required=True, help="LibriSpeech split root (searched recursively)")
    p.add_argument("--output", required=True, help="output TSV manifest path")
    args = p.parse_args()

    from tensorflowasr_tpu.data import audio as audio_lib

    text_files = sorted(glob.glob(os.path.join(args.directory, "**", "*.txt"), recursive=True))
    transcripts = []
    for text_file in text_files:
        current_dir = os.path.dirname(text_file)
        with open(text_file, "r", encoding="utf-8") as txt:
            lines = txt.read().splitlines()
        for line in lines:
            parts = line.split(" ", maxsplit=1)
            if len(parts) != 2:
                continue
            audio_file = os.path.join(current_dir, parts[0] + ".flac")
            if not os.path.exists(audio_file):
                continue
            duration = audio_lib.audio_duration(audio_file)
            text = unicodedata.normalize("NFKC", parts[1])
            transcripts.append(f"{audio_file}\t{duration:.3f}\t{text.lower()}\n")

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "w", encoding="utf-8") as out:
        out.write("PATH\tDURATION\tTRANSCRIPT\n")
        out.writelines(transcripts)
    print(f"wrote {len(transcripts)} entries to {args.output}")


if __name__ == "__main__":
    main()

"""Manifest and segment-file formats.

The reference's stages communicate through the filesystem (SURVEY.md §1):

* fairseq-style TSV manifest — first line is the root dir, following lines
  are relative audio paths, optionally "\t<num_frames>"
  (pseudo-labelling/gen_metadata.py:91-119 == utils/build_manifest.py).
* per-segment transcript txt — the reference has TWO incompatible schemas
  (SURVEY.md §7.3 #6): the 2-line format written by the segmenter
  (prepare_dataset.py:118-124: transcript / prev-transcript) and the 5-line
  format read by dataset/cool_dataset.py:60-67 (transcript / blank /
  end-segment transcript / blank / prev). This module defines ONE canonical
  in-memory record (SegmentText) and reads/writes both formats explicitly.
"""

from __future__ import annotations

import dataclasses
import os
import random
from typing import List, Optional, Tuple


@dataclasses.dataclass
class Manifest:
    root: str
    paths: List[str]
    frames: Optional[List[int]] = None  # per-path sample counts, if known

    def __len__(self) -> int:
        return len(self.paths)

    def absolute_paths(self) -> List[str]:
        return [os.path.join(self.root, p) for p in self.paths]

    def transcript_paths(self, audio_ext: str = "flac") -> List[str]:
        # the reference derives txt paths with str.replace('flac', 'txt')
        # (hallucination_detector.py:153); we replace the extension properly
        return [
            os.path.join(self.root, os.path.splitext(p)[0] + ".txt")
            for p in self.paths
        ]


def read_manifest(path: str) -> Manifest:
    with open(path, encoding="utf-8") as f:
        root = f.readline().strip()
        paths: List[str] = []
        frames: List[int] = []
        has_frames = True
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split("\t")
            paths.append(parts[0])
            if len(parts) > 1 and parts[1].isdigit():
                frames.append(int(parts[1]))
            else:
                has_frames = False
    return Manifest(root=root, paths=paths,
                    frames=frames if has_frames and frames else None)


def write_manifest(path: str, manifest: Manifest):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        print(manifest.root, file=f)
        for i, p in enumerate(manifest.paths):
            if manifest.frames is not None:
                print(f"{p}\t{manifest.frames[i]}", file=f)
            else:
                print(p, file=f)


def split_valid(
    manifest: Manifest, valid_percent: float, seed: int = 42
) -> Tuple[Manifest, Manifest]:
    """Random train/valid split (reference --valid-percent,
    gen_metadata.py:73-121)."""
    assert 0.0 <= valid_percent <= 0.5
    rng = random.Random(seed)
    idx = list(range(len(manifest.paths)))
    valid_ids = set()
    for i in idx:
        if rng.random() < valid_percent:
            valid_ids.add(i)

    def pick(ids):
        return Manifest(
            root=manifest.root,
            paths=[manifest.paths[i] for i in ids],
            frames=[manifest.frames[i] for i in ids] if manifest.frames else None,
        )

    train_ids = [i for i in idx if i not in valid_ids]
    return pick(train_ids), pick(sorted(valid_ids))


# ---------------------------------------------------------------------------
# segment transcript files
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SegmentText:
    """One 30 s segment's transcript record.

    transcript: timestamp-token text, ends with <|endoftext|> (and possibly
        <|continued|> before it when the last utterance spans the boundary)
    prev_transcript: previous segment's transcript (prompt source)
    end_transcript: text of the last (possibly continued) utterance — only
        present in the 5-line schema
    """

    transcript: str
    prev_transcript: str = ""
    end_transcript: str = ""


def read_segment_txt(path: str) -> SegmentText:
    """Read either schema, keyed on line count."""
    with open(path, encoding="utf-8") as f:
        lines = [l.rstrip("\n") for l in f.readlines()]
    if len(lines) >= 5:
        return SegmentText(
            transcript=lines[0].strip(),
            end_transcript=lines[2].strip(),
            prev_transcript=lines[4].strip(),
        )
    return SegmentText(
        transcript=lines[0].strip() if lines else "",
        prev_transcript=lines[1].strip() if len(lines) > 1 else "",
    )


def write_segment_txt(path: str, seg: SegmentText, schema: int = 2):
    """Write the canonical 2-line schema (default) or the 5-line schema."""
    with open(path, "w", encoding="utf-8") as f:
        if schema == 2:
            f.write(seg.transcript + "\n")
            f.write(seg.prev_transcript + "\n")
        elif schema == 5:
            f.write(seg.transcript + "\n\n")
            f.write(seg.end_transcript + "\n\n")
            f.write(seg.prev_transcript + "\n")
        else:
            raise ValueError(f"unknown schema {schema}")

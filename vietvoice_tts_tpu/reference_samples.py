"""Built-in reference-voice sample catalog.

Equivalent of the reference's ``vietvoicetts/reference_samples.py:36-167``:
a dataclass per sample with gender/group/area/emotion tags + transcript, CSV
loading, filtering, path resolution and best-effort playback. The catalog file
location differs: we look for (in order)

1. ``$VIETVOICE_SAMPLES_CSV`` (explicit override),
2. ``<model_cache>/reference_samples.csv`` next to the weight pack,
3. the bundled ``models_data/reference_samples.csv`` in this repo.

The reference audio clips themselves live in the weight pack's ``audios/``
directory (the reference stores them inside its model tarball,
``core/model.py:206-210``).
"""

from __future__ import annotations

import csv
import os
import shutil
import subprocess
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional

from .config import MODEL_AREA, MODEL_EMOTION, MODEL_GENDER, MODEL_GROUP

__all__ = [
    "ReferenceSample",
    "load_reference_samples",
    "filter_samples",
    "get_sample_path",
    "play_sample",
    "MODEL_GENDER",
    "MODEL_GROUP",
    "MODEL_AREA",
    "MODEL_EMOTION",
]


@dataclass(slots=True)
class ReferenceSample:
    """One catalog row: clip file + voice tags + transcript."""

    filename: str
    gender: str
    group: str
    area: str
    emotion: str
    text: str

    def matches(
        self,
        gender: Optional[str] = None,
        group: Optional[str] = None,
        area: Optional[str] = None,
        emotion: Optional[str] = None,
    ) -> bool:
        return (
            (gender is None or self.gender == gender)
            and (group is None or self.group == group)
            and (area is None or self.area == area)
            and (emotion is None or self.emotion == emotion)
        )


def _candidate_csv_paths() -> List[Path]:
    paths = []
    env = os.environ.get("VIETVOICE_SAMPLES_CSV")
    if env:
        paths.append(Path(env))
    cache = Path(os.environ.get("VIETVOICE_TPU_CACHE", "models")).expanduser()
    paths.append(cache / "reference_samples.csv")
    paths.append(Path(__file__).resolve().parent.parent / "models_data" / "reference_samples.csv")
    return paths


def catalog_csv_path() -> Optional[Path]:
    for p in _candidate_csv_paths():
        if p.exists():
            return p
    return None


def load_reference_samples() -> List[ReferenceSample]:
    """Load the catalog; empty list when no CSV is found (graceful degrade,
    matching reference reference_samples.py:81-110)."""
    csv_path = catalog_csv_path()
    if csv_path is None:
        return []
    samples: List[ReferenceSample] = []
    with csv_path.open(newline="", encoding="utf-8") as fh:
        for row in csv.reader(fh):
            if len(row) < 6:
                continue
            filename, gender, group, area, emotion, text = row[:6]
            samples.append(
                ReferenceSample(
                    filename=filename.strip(),
                    gender=gender.strip().lower(),
                    group=group.strip().lower(),
                    area=area.strip().lower(),
                    emotion=emotion.strip().lower(),
                    text=text.strip(),
                )
            )
    return samples


def filter_samples(
    samples: List[ReferenceSample],
    *,
    gender: Optional[str] = None,
    group: Optional[str] = None,
    area: Optional[str] = None,
    emotion: Optional[str] = None,
) -> List[ReferenceSample]:
    gender = gender and gender.lower()
    group = group and group.lower()
    area = area and area.lower()
    emotion = emotion and emotion.lower()
    return [s for s in samples if s.matches(gender, group, area, emotion)]


def get_sample_path(sample: ReferenceSample) -> Path:
    """Resolve a sample's audio file on disk: organized path under the weight
    pack's ``audios/`` dir, flat-filename fallback."""
    cache = Path(os.environ.get("VIETVOICE_TPU_CACHE", "models")).expanduser()
    for base in (cache / "audios", cache):
        organized = base / sample.filename
        if organized.exists():
            return organized
        flat = base / Path(sample.filename).name
        if flat.exists():
            return flat
    return cache / "audios" / sample.filename


def play_sample(sample: ReferenceSample) -> None:
    """Best-effort local playback via ffplay/aplay; prints the path otherwise
    (reference reference_samples.py:148-167 uses pydub.playback)."""
    path = get_sample_path(sample)
    for player, args in (("ffplay", ["-nodisp", "-autoexit"]), ("aplay", [])):
        exe = shutil.which(player)
        if exe:
            print(f"\n  Playing {path.name} ... (Ctrl-C to stop)\n")
            try:
                subprocess.run([exe, *args, str(path)], check=False)
                return
            except Exception:  # pragma: no cover — best effort
                break
    print(f"  Unable to auto-play audio. You can open the file manually: {path}")

"""Name-resolution and identifier semantics from the reference's API edge.

* ``find_similar_str`` — the fuzzy matcher behind region/layer-name
  resolution (/root/reference/pydriosm/downloader/_downloader.py:315-397
  uses pyhelpers' difflib-based matcher with a similarity gate): we
  re-implement on stdlib difflib with the same contract — best match
  above a cutoff or None.
* ``validate_layer_names`` — 'all' -> the sorted 13-layer list, else each
  input fuzzy-resolved (parser.py:128-178 semantics).
* ``sanitize_table_name`` — PostgreSQL identifier rules the reference
  applies before DB I/O (/root/reference/pydriosm/ios/utils.py:88-121):
  punctuation collapsed to spaces/underscores and names longer than 63
  bytes truncated to the first 60 chars + '..'.
* ``InvalidNameError`` — the engine's analogue of the reference's
  InvalidSubregionNameError (errors.py:6-70).
"""

from __future__ import annotations

import difflib
import string

SHP_LAYER_NAMES = [
    "buildings", "landuse", "natural", "places", "pofw", "points", "pois",
    "railways", "roads", "traffic", "transport", "water", "waterways",
]

PBF_LAYER_NAMES = ["points", "lines", "multilinestrings", "multipolygons", "other_relations"]


class InvalidNameError(Exception):
    def __init__(self, name: str, candidates=None):
        self.name = name
        msg = f"{name!r} is not a valid name"
        if candidates:
            msg += f"; did you mean one of {list(candidates)[:5]}?"
        super().__init__(msg)


def find_similar_str(x: str, candidates, cutoff: float = 0.4) -> str | None:
    """Best fuzzy match (case-insensitive) above ``cutoff``, else None."""
    lookup = {c.lower(): c for c in candidates}
    hits = difflib.get_close_matches(x.lower(), list(lookup), n=1, cutoff=cutoff)
    return lookup[hits[0]] if hits else None


def validate_layer_names(layer_names, family: str = "shp") -> list[str]:
    """'all' / None -> the full sorted list; else fuzzy-resolve each name,
    raising InvalidNameError on no plausible match."""
    valid = SHP_LAYER_NAMES if family == "shp" else PBF_LAYER_NAMES
    if layer_names in (None, "all"):
        return sorted(valid)
    if isinstance(layer_names, str):
        layer_names = [layer_names]
    out = []
    for n in layer_names:
        m = find_similar_str(n, valid)
        if m is None:
            raise InvalidNameError(n, valid)
        out.append(m)
    return sorted(dict.fromkeys(out))


def sanitize_table_name(name: str, max_len: int = 63) -> str:
    """Identifier-safe table name (ios/utils.py:88-121 semantics):
    punctuation (except _ and -) -> space, spaces -> underscores,
    over-length names -> first ``max_len - 3`` chars + '..'."""
    keep = set(string.ascii_letters + string.digits + " _-")
    cleaned = "".join(ch if ch in keep else " " for ch in name)
    cleaned = "_".join(cleaned.split())
    if len(cleaned) > max_len:
        cleaned = cleaned[: max_len - 3] + ".."
    return cleaned

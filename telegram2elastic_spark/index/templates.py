"""ES index templates + component templates (`_index_template`,
`_component_template`, `_index_template/_simulate_index`).

ES resolves an index's effective settings/mappings at creation time:
the highest-priority index template whose `index_patterns` match the
name wins (two templates with the same priority matching one name is a
conflict — rejected at PUT time, like ES); its `composed_of` component
templates merge in list order, and the index template's own `template`
block is applied LAST.  Merging is ES's template merge: objects merge
recursively, scalars/arrays are replaced by the later source.

The store is the same atomic-JSON pattern as aliases.json (tmp +
os.replace — crash leaves either the old or the new state, never a torn
file).  Reference analogue: the reference creates per-day ES indices
whose mappings come from templates (output/elasticsearch.py:10 daily
index pattern; ES applies matching templates at index auto-creation).
"""

from __future__ import annotations

import fnmatch
import json
import os


def _state_path(root: str) -> str:
    return os.path.join(root, "templates.json")


def _load(root: str) -> dict:
    p = _state_path(root)
    if not os.path.exists(p):
        return {"component": {}, "index": {}}
    with open(p) as f:
        return json.load(f)


def _commit(root: str, state: dict) -> None:
    tmp = _state_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
    os.replace(tmp, _state_path(root))


def deep_merge(base: dict, overlay: dict) -> dict:
    """ES template merge: dict values merge recursively; any other value
    (scalar, list) is REPLACED by the overlay — ES does not concatenate
    arrays in template composition."""
    out = dict(base)
    for key, val in overlay.items():
        if key in out and isinstance(out[key], dict) and isinstance(val, dict):
            out[key] = deep_merge(out[key], val)
        else:
            out[key] = val
    return out


def put_component_template(root: str, name: str, template: dict) -> None:
    """PUT _component_template/<name>: {"template": {settings?, mappings?}}."""
    if "template" not in template:
        raise ValueError("component template body needs a 'template' block")
    state = _load(root)
    state["component"][name] = template
    _commit(root, state)


def put_index_template(
    root: str,
    name: str,
    index_patterns: list[str],
    priority: int = 0,
    composed_of: list[str] | None = None,
    template: dict | None = None,
) -> None:
    """PUT _index_template/<name>.  Rejects unknown composed_of members
    and same-priority overlapping patterns (the ES PUT-time conflict
    check: two templates at one priority must not both match any
    name — checked on the pattern sets' literal overlap)."""
    state = _load(root)
    for c in composed_of or []:
        if c not in state["component"]:
            raise ValueError(f"unknown component template: {c!r}")
    for other_name, other in state["index"].items():
        if other_name == name or other["priority"] != int(priority):
            continue
        for pa in index_patterns:
            for pb in other["index_patterns"]:
                # conservative overlap check: either pattern matches the
                # other pattern's literal prefix form
                if fnmatch.fnmatch(pa.replace("*", "x"), pb) or fnmatch.fnmatch(
                    pb.replace("*", "x"), pa
                ):
                    raise ValueError(
                        f"index template {name!r} has same priority "
                        f"{priority} as {other_name!r} with overlapping "
                        f"patterns ({pa!r} vs {pb!r})"
                    )
    state["index"][name] = {
        "index_patterns": list(index_patterns),
        "priority": int(priority),
        "composed_of": list(composed_of or []),
        "template": template or {},
    }
    _commit(root, state)


def matching_template(root: str, index_name: str) -> str | None:
    """Highest-priority index template matching `index_name` (name ties
    broken lexicographically — deterministic, ES forbids real ties)."""
    state = _load(root)
    best: tuple[int, str] | None = None
    for name, t in state["index"].items():
        if any(fnmatch.fnmatch(index_name, p) for p in t["index_patterns"]):
            key = (t["priority"], name)
            if best is None or key > best:
                best = key
    return best[1] if best else None


def simulate_index(root: str, index_name: str) -> dict:
    """_index_template/_simulate_index/<name>: the effective
    {settings, mappings} the index would be created with, plus which
    template matched.  Components merge in composed_of order; the index
    template's own block wins last."""
    name = matching_template(root, index_name)
    if name is None:
        return {"matched_template": None, "template": {}}
    state = _load(root)
    t = state["index"][name]
    eff: dict = {}
    for c in t["composed_of"]:
        eff = deep_merge(eff, state["component"][c]["template"])
    eff = deep_merge(eff, t["template"])
    return {"matched_template": name, "template": eff}

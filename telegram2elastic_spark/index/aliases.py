"""ES index aliases + rollover — the ILM hot-phase rotation over on-disk
index generations.

The reference writes to per-day ES indices and reads through Kibana's
index patterns (output/elasticsearch.py:10 — `index_name` is a strftime
pattern; README.md:5).  ES formalizes that as ALIASES: a write alias
points at exactly one generation, a read alias fans out over all of
them, and `_rollover` swings the write alias to a fresh generation when
the current one exceeds max_docs / max_age.  This module owns that
lifecycle for the engine's on-disk indexes:

  <root>/aliases.json            atomic alias state (tmp + os.replace,
                                 the manifest-commit pattern from
                                 streaming/ingest.py)
  <root>/<alias>-000001/ ...     index generations (write_index layout)

Query-side, a read alias resolves to its generation dirs and serves via
the federated path (query/federated.py) — per-index BM25 stats, k-way
merge, exactly ES's cross-index query_then_fetch semantics.
"""

from __future__ import annotations

import json
import os
import re
import time

_GEN_RE = re.compile(r"^(.*)-(\d{6})$")


def _state_path(root: str) -> str:
    return os.path.join(root, "aliases.json")


def _load(root: str) -> dict:
    p = _state_path(root)
    if not os.path.exists(p):
        return {"aliases": {}}
    with open(p) as f:
        return json.load(f)


def _commit(root: str, state: dict) -> None:
    tmp = _state_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
    os.replace(tmp, _state_path(root))


def gen_name(alias: str, n: int) -> str:
    return f"{alias}-{n:06d}"


def alias_init(root: str, alias: str, created_at: float | None = None) -> str:
    """Create generation 1 for `alias` and point both the write and read
    sides at it.  Returns the generation dir (caller builds the index
    into it with write_index)."""
    os.makedirs(root, exist_ok=True)
    state = _load(root)
    if alias in state["aliases"]:
        raise ValueError(f"alias exists: {alias}")
    first = gen_name(alias, 1)
    state["aliases"][alias] = {
        "indices": [first],
        "write_index": first,
        "created_at": {first: float(created_at if created_at is not None
                                    else time.time())},
    }
    os.makedirs(os.path.join(root, first), exist_ok=True)
    _commit(root, state)
    return os.path.join(root, first)


def resolve_alias(root: str, alias: str, write: bool = False) -> list[str]:
    """Read alias -> every generation dir; write=True -> just the write
    generation."""
    a = _load(root)["aliases"].get(alias)
    if a is None:
        raise KeyError(alias)
    names = [a["write_index"]] if write else a["indices"]
    return [os.path.join(root, n) for n in names]


def rollover(
    spark,
    root: str,
    alias: str,
    max_docs: int | None = None,
    max_age_sec: float | None = None,
    now: float | None = None,
    created_at: float | None = None,
) -> tuple[bool, str | None]:
    """ES `_rollover`: if the WRITE generation satisfies any condition
    (doc count >= max_docs, age >= max_age_sec), create the next
    generation, swing the write alias to it, and append it to the read
    alias — one atomic aliases.json commit.  Conditions are checked
    against the write generation's own stats table (driver reads one
    1-row parquet aggregate; no corpus scan).

    Returns (rolled, new_generation_dir)."""
    from .build import read_index

    state = _load(root)
    a = state["aliases"].get(alias)
    if a is None:
        raise KeyError(alias)
    cur = a["write_index"]
    now = float(now if now is not None else time.time())
    hit = False
    if max_docs is not None:
        idx = read_index(spark, os.path.join(root, cur))
        n_docs = int(idx["stats"].select("n_docs").first()[0] or 0)
        hit = hit or n_docs >= int(max_docs)
    if max_age_sec is not None:
        born = float(a.get("created_at", {}).get(cur, now))
        hit = hit or (now - born) >= float(max_age_sec)
    if not hit:
        return False, None
    n = int(_GEN_RE.match(cur).group(2)) + 1
    nxt = gen_name(alias, n)
    os.makedirs(os.path.join(root, nxt), exist_ok=True)
    a["indices"].append(nxt)
    a["write_index"] = nxt
    a.setdefault("created_at", {})[nxt] = float(
        created_at if created_at is not None else now
    )
    _commit(root, state)
    return True, os.path.join(root, nxt)


def search_alias(
    spark, root: str, alias: str, terms: list[str], k: int = 10
) -> list[tuple]:
    """Query THROUGH a read alias: resolve generations, serve each with
    its own index stats, k-way merge — the federated contract
    (query/federated.py); empty generations (freshly rolled, not yet
    built) are skipped."""
    from ..query.federated import federated_topk_indexed
    from .build import read_index

    indexes = {}
    for d in resolve_alias(root, alias):
        if not os.path.exists(os.path.join(d, "postings")):
            continue  # rolled but not yet built
        indexes[os.path.basename(d)] = read_index(spark, d)
    return federated_topk_indexed(indexes, terms, k=k)

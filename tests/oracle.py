"""Independent pure-Python oracle for nested-denormalization semantics.

A deliberately naive, dictionary-based reimplementation of the reference
semantics (SURVEY §1.6, §2 O5/O6/O13) used to golden-check the Spark
engine. It shares no code with southpaw_spark.operators — if both agree,
the Spark plan is trusted.
"""

from __future__ import annotations


def apply_filters(events: list[dict], rules: list[tuple], cols: list[str]) -> list[dict]:
    """rules: list of (predicate(dict)->bool, mode). SKIP drops the event,
    DELETE rewrites it into a tombstone."""
    out = []
    for ev in events:
        ev = dict(ev)
        skip = False
        for pred, mode in rules:
            if not ev["is_tombstone"] and pred(ev):
                if mode == "skip":
                    skip = True
                elif mode == "delete":
                    ev["is_tombstone"] = True
        if not skip:
            out.append(ev)
    return out


def current_state(events: list[dict], key_cols: list[str]) -> dict[tuple, dict]:
    """Latest-by-key, tombstones dropped. Returns key-tuple → row."""
    latest: dict[tuple, dict] = {}
    for ev in sorted(events, key=lambda e: e["seq"]):
        k = tuple(ev[c] for c in key_cols)
        latest[k] = ev
    return {
        k: {c: v for c, v in ev.items() if c not in ("seq", "is_tombstone")}
        for k, ev in latest.items()
        if not ev["is_tombstone"]
    }


def tombstoned_keys(events: list[dict], key_cols: list[str]) -> set[tuple]:
    latest: dict[tuple, dict] = {}
    for ev in sorted(events, key=lambda e: e["seq"]):
        latest[tuple(ev[c] for c in key_cols)] = ev
    return {k for k, ev in latest.items() if ev["is_tombstone"]}


def build_doc(
    states: dict[str, dict[tuple, dict]],
    keys: dict[str, list[str]],
    node: dict,
    row: dict,
) -> dict:
    """Recursive doc assembly; returns {"Record": ..., "Children": ...}.
    Null fields are dropped from Record (canonicalization matching
    to_json ignoreNullFields); NULL parent key → child entity key absent;
    no matches → empty list. Children ordered by child PK."""
    doc: dict = {"Record": {k: v for k, v in row.items() if v is not None}}
    children = node.get("Children") or []
    if not children:
        return doc
    doc["Children"] = {}
    for child in children:
        entity = child["Entity"]
        jk, pk_col = child["JoinKey"], child["ParentKey"]
        parent_val = row.get(pk_col)
        if parent_val is None:
            continue  # absent key
        matches = [
            (k, r)
            for k, r in states[entity].items()
            if r.get(jk) == parent_val
        ]
        matches.sort(key=lambda kr: kr[0])
        doc["Children"][entity] = [
            build_doc(states, keys, child, r) for _, r in matches
        ]
    return doc


def denormalize(
    changelogs: dict[str, list[dict]],
    keys: dict[str, list[str]],
    tree: dict,
    filter_rules: dict[str, list[tuple]] | None = None,
) -> dict[tuple, dict | None]:
    """Full-corpus oracle: root PK tuple → document (None = tombstone)."""
    filter_rules = filter_rules or {}
    filtered = {
        e: apply_filters(evs, filter_rules.get(e, []), keys[e])
        for e, evs in changelogs.items()
    }
    states = {e: current_state(evs, keys[e]) for e, evs in filtered.items()}
    root_entity = tree["Entity"]
    out: dict[tuple, dict | None] = {}
    for k, row in states[root_entity].items():
        out[k] = build_doc(states, keys, tree, row)
    for k in tombstoned_keys(filtered[root_entity], keys[root_entity]):
        if k not in states[root_entity]:
            out[k] = None
    return out

"""Relation-tree model: the engine's "query" definition.

Mirrors the reference's relations JSON (reference:
``src/main/resources/southpaw/schema/relations.json:7-37``) and its
validation rules (``util/RelationHelper.java:89-127``):

* a root relation must carry ``denormalized_name``, ``entity`` and at
  least an (optionally empty) list of children;
* every non-root relation must carry ``entity``, ``join_key`` and
  ``parent_key`` — the join condition is always
  ``child.join_key == parent.parent_key`` (single-column equi-join);
* entity lookup within one tree is first-match (the same entity twice in
  one tree is unsupported; the same entity in *different* trees is fine,
  ``util/RelationHelper.java:25-35``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


class RelationError(ValueError):
    """Invalid relation-tree definition."""


@dataclass
class Relation:
    """One node of a denormalization tree.

    ``join_key`` is the child-side column, ``parent_key`` the
    parent-side column (reference ``schema/relations.json:20-27``).
    """

    entity: str
    denormalized_name: str | None = None
    join_key: str | None = None
    parent_key: str | None = None
    children: list["Relation"] = field(default_factory=list)

    @property
    def is_root(self) -> bool:
        return self.denormalized_name is not None

    def walk(self):
        """Pre-order traversal of the tree."""
        yield self
        for child in self.children:
            yield from child.walk()

    def find_entity(self, entity: str) -> "Relation | None":
        """First-match entity lookup (reference RelationHelper.java:25-35)."""
        for node in self.walk():
            if node.entity == entity:
                return node
        return None

    def entities(self) -> list[str]:
        return [node.entity for node in self.walk()]

    @classmethod
    def from_dict(cls, d: dict) -> "Relation":
        """Parse the reference's JSON relation format (PascalCase keys)
        or our snake_case equivalent."""

        def get(key_pascal: str, key_snake: str):
            if key_pascal in d:
                return d[key_pascal]
            return d.get(key_snake)

        children = get("Children", "children") or []
        return cls(
            entity=get("Entity", "entity"),
            denormalized_name=get("DenormalizedName", "denormalized_name"),
            join_key=get("JoinKey", "join_key"),
            parent_key=get("ParentKey", "parent_key"),
            children=[cls.from_dict(c) for c in children],
        )


def validate_relation(relation: Relation, *, _is_root: bool = True) -> None:
    """Validate a tree per the reference rules (RelationHelper.java:89-127)."""
    if not relation.entity:
        raise RelationError("every relation must declare an entity")
    if _is_root:
        if not relation.denormalized_name:
            raise RelationError(
                f"root relation for entity {relation.entity!r} must declare "
                "a denormalized_name"
            )
        if relation.children is None:
            raise RelationError("root relation must declare children")
    else:
        if not relation.join_key or not relation.parent_key:
            raise RelationError(
                f"child relation {relation.entity!r} must declare both "
                "join_key and parent_key"
            )
    seen: set[str] = set()
    for node in relation.walk():
        if node.entity in seen:
            raise RelationError(
                f"entity {node.entity!r} appears more than once in tree "
                f"{relation.denormalized_name!r}; first-match lookup makes "
                "this unsupported (reference RelationHelper.java:25-35)"
            )
        seen.add(node.entity)
    for child in relation.children:
        validate_relation(child, _is_root=False)


def load_relations(source: str | list[dict]) -> list[Relation]:
    """Load one or more relation trees from a JSON string, a path to a
    JSON file, or an already-parsed list of dicts. Multiple trees may
    share input entities (reference ``index/Indices.java:103-112``)."""
    if isinstance(source, str):
        if source.lstrip().startswith("["):
            data = json.loads(source)
        else:
            with open(source) as f:
                data = json.load(f)
    else:
        data = source
    relations = [Relation.from_dict(d) for d in data]
    for r in relations:
        validate_relation(r)
    return relations

import pytest

from southpaw_spark.relations import (
    Relation,
    RelationError,
    load_relations,
    validate_relation,
)
from southpaw_spark.testing import RELATION_TREES


def test_load_reference_shaped_trees():
    rels = load_relations(RELATION_TREES)
    assert [r.denormalized_name for r in rels] == [
        "DenormalizedPlaylist",
        "DenormalizedPlayer",
        "DenormalizedMedia",
    ]
    playlist = rels[0]
    assert playlist.entity == "playlist"
    assert [c.entity for c in playlist.children] == [
        "user",
        "playlist_tag",
        "playlist_custom_params",
        "playlist_media",
    ]
    media_child = playlist.children[3].children[0]
    assert media_child.entity == "media"
    assert media_child.join_key == "id"
    assert media_child.parent_key == "media_id"


def test_root_requires_denormalized_name():
    with pytest.raises(RelationError, match="denormalized_name"):
        validate_relation(Relation(entity="playlist"))


def test_child_requires_join_and_parent_key():
    bad = Relation(
        entity="playlist",
        denormalized_name="D",
        children=[Relation(entity="user", join_key="user_id")],
    )
    with pytest.raises(RelationError, match="join_key and parent_key"):
        validate_relation(bad)


def test_duplicate_entity_in_one_tree_rejected():
    bad = Relation(
        entity="playlist",
        denormalized_name="D",
        children=[
            Relation(entity="user", join_key="user_id", parent_key="user_id"),
            Relation(entity="user", join_key="user_id", parent_key="owner_id"),
        ],
    )
    with pytest.raises(RelationError, match="more than once"):
        validate_relation(bad)


def test_same_entity_across_trees_ok():
    rels = load_relations(RELATION_TREES)
    # `user` participates in all three trees; `media` is child in one,
    # root of another (reference SouthpawEndToEndTest.java:63-68).
    for r in rels:
        assert r.find_entity("user") is not None


def test_walk_and_entities():
    rels = load_relations(RELATION_TREES)
    assert rels[0].entities() == [
        "playlist",
        "user",
        "playlist_tag",
        "user_tag",
        "playlist_custom_params",
        "playlist_media",
        "media",
    ]

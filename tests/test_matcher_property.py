"""Property-based test of the wildcard topic matcher's semantics.

An independent reimplementation of the reference's per-segment compare
(engine/matcher_v2_naive.go:73-90: split on '.', '*' matches exactly
one segment, segment counts must agree) is checked against the regex
the engine actually routes with — for arbitrary topics and patterns.
Pure python (the regex string is what .rlike evaluates; Java and
Python agree on this subset: literals, [^.]+, anchors, \\.).
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from dbus_spark.pipeline.matcher import wildcard_to_regex

SEG = st.text(alphabet="abc*", min_size=1, max_size=4).filter(
    lambda s: s == "*" or "*" not in s
)
TOPIC_SEG = st.text(alphabet="abc*.", min_size=0, max_size=4).filter(
    lambda s: "." not in s
)


def naive_match(pattern: str, topic: str) -> bool:
    """The reference's semantics, reimplemented independently."""
    p_segs = pattern.split(".")
    t_segs = topic.split(".")
    if len(p_segs) != len(t_segs):
        return False
    return all(
        p == "*" or p == t for p, t in zip(p_segs, t_segs)
    )


@settings(max_examples=300, deadline=None)
@given(
    p_segs=st.lists(SEG, min_size=1, max_size=4),
    t_segs=st.lists(TOPIC_SEG, min_size=1, max_size=4),
)
def test_regex_equals_reference_segment_semantics(p_segs, t_segs):
    pattern = ".".join(p_segs)
    topic = ".".join(t_segs)
    got = re.search(wildcard_to_regex(pattern), topic) is not None
    assert got == naive_match(pattern, topic), (pattern, topic)


@settings(max_examples=100, deadline=None)
@given(t_segs=st.lists(TOPIC_SEG, min_size=1, max_size=4))
def test_pattern_matches_itself_iff_no_star_segments(t_segs):
    topic = ".".join(t_segs)
    if "*" in topic or "" in t_segs:
        return  # '*' in a topic is data, not a pattern; skip
    assert re.search(wildcard_to_regex(topic), topic)

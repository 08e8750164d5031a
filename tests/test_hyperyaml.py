"""Config kernel semantics tests.

Each case mirrors a documented behavior of the reference's vendored
HyperPyYAML (reference ``src/hyperpyyaml/core.py``) that the recipes depend
on: refs with arithmetic and interpolation, shared-object refs, copies,
placeholders, include-with-overrides, tuples, and the tagged-scalar override
channel used by ``--model !include:...`` (reference ``test.sh:8``).
"""
import collections

import pytest

from mlvae_tpu.hyperyaml import load_hyperyaml, recursive_update
from mlvae_tpu.hyperyaml.loader import _parse_tagged, TaggedValue
from mlvae_tpu.hyperyaml.registry import register


def test_basic_ref_and_arithmetic():
    y = """
a: 3
b: !ref <a>
c: !ref <a> * 2 + 1
d: !ref <a> // 2
e: results/<nothing
"""
    h = load_hyperyaml(y)
    assert h["b"] == 3
    assert h["c"] == 7
    assert h["d"] == 1


def test_string_interpolation():
    y = """
name: exp1
out: !ref results/<name>/ckpt
"""
    h = load_hyperyaml(y)
    assert h["out"] == "results/exp1/ckpt"


def test_chained_refs_preserve_type():
    y = """
a: 3.5
b: !ref <a>
c: !ref <b>
"""
    h = load_hyperyaml(y)
    assert h["c"] == 3.5 and isinstance(h["c"], float)


def test_new_constructs_object():
    y = """
a: 3
thing: !new:collections.Counter
    b: !ref <a>
"""
    h = load_hyperyaml(y)
    assert h["thing"] == collections.Counter(b=3)


def test_shared_ref_same_object():
    y = """
enc: !new:collections.Counter
    x: 1
modules:
    enc: !ref <enc>
recoverables:
    enc: !ref <enc>
"""
    h = load_hyperyaml(y)
    assert h["modules"]["enc"] is h["enc"]
    assert h["recoverables"]["enc"] is h["enc"]


def test_copy_makes_distinct_object():
    y = """
enc: !new:collections.Counter
    x: 1
other: !copy <enc>
"""
    h = load_hyperyaml(y)
    assert h["other"] == h["enc"]
    assert h["other"] is not h["enc"]


def test_placeholder_raises():
    with pytest.raises(ValueError):
        load_hyperyaml("a: !PLACEHOLDER")


def test_placeholder_overridden_ok():
    h = load_hyperyaml("a: !PLACEHOLDER", overrides={"a": 5})
    assert h["a"] == 5


def test_tuple_implicit():
    h = load_hyperyaml("a: (3, 4)")
    assert h["a"] == (3, 4)


def test_name_partial():
    y = """
fn: !name:builtins.round
    ndigits: 2
"""
    h = load_hyperyaml(y)
    assert h["fn"](3.14159) == 3.14


def test_apply_called_at_load():
    calls = []
    register("testing.record", lambda v: calls.append(v) or v)
    h = load_hyperyaml("__x: !apply:testing.record [42]\ny: 1")
    assert calls == [42]
    assert "__x" not in h  # double-underscore keys removed


def test_include_with_child_overrides(tmp_path):
    inc = tmp_path / "model.yaml"
    inc.write_text("size: !PLACEHOLDER\ndouble: !ref <size> * 2\n")
    main = tmp_path / "run.yaml"
    main.write_text(
        "n: 8\n"
        "model: !PLACEHOLDER\n"
        "    size: !ref <n>\n"
    )
    # simulate CLI override: model tag replaced by !include:, children kept
    overrides = _parse_tagged("model: !include:model.yaml")
    with open(main) as f:
        h = load_hyperyaml(f, overrides=overrides)
    assert h["model"]["size"] == 8
    assert h["model"]["double"] == 16


def test_recursive_update_nested():
    d = {"a": 1, "b": {"c": 2}}
    recursive_update(d, {"b": {"d": 3}})
    assert d == {"a": 1, "b": {"c": 2, "d": 3}}


def test_attribute_ref():
    y = """
thing: !new:fractions.Fraction
    numerator: 3
    denominator: 4
num: !ref <thing.numerator>
"""
    h = load_hyperyaml(y)
    assert h["num"] == 3


def test_overrides_affect_refs():
    y = """
a: 3
b: !ref <a> * 2
"""
    h = load_hyperyaml(y, overrides={"a": 5})
    assert h["b"] == 10


def test_resolve_references_stream_output():
    from mlvae_tpu.hyperyaml import resolve_references
    import yaml as pyyaml
    out = resolve_references("a: 3\nb: !ref <a> * 2\n").getvalue()
    data = pyyaml.safe_load(out.replace("!new:", ""))
    assert data["b"] == 6


def test_dump_hyperyaml_tags():
    from io import StringIO
    from mlvae_tpu.hyperyaml import dump_hyperyaml, Placeholder, RefTag
    sio = StringIO()
    dump_hyperyaml({"a": Placeholder(), "b": RefTag("<a>")}, sio)
    text = sio.getvalue()
    assert "!PLACEHOLDER" in text and "!ref" in text and "<a>" in text


def test_explicit_tuple_tag():
    h = load_hyperyaml("a: !tuple (1, 2, 3)")
    assert h["a"] == (1, 2, 3)


def test_label_encoder_blank_index():
    from mlvae_tpu.data.encoder import LabelEncoder
    enc = LabelEncoder()
    enc.update_from_iterable(["x", "y"])
    enc.insert_blank(index=0)
    assert enc.get_blank_index() == 0


def test_recursive_update_keep_objects():
    """The post-materialization extra_overrides re-merge must not clobber
    constructed objects with raw dicts (regression: checkpointer backend
    override replaced the Checkpointer instance)."""
    from mlvae_tpu.hyperyaml.loader import recursive_update

    class Thing:
        pass

    obj = Thing()
    h = {"model": {"checkpointer": obj, "n_epochs": 5}}
    recursive_update(h, {"model": {"checkpointer": {"backend": "orbax"},
                                   "n_epochs": 2}}, keep_objects=True)
    assert h["model"]["checkpointer"] is obj   # object preserved
    assert h["model"]["n_epochs"] == 2         # scalar still overridden


def test_quoted_parenthesized_string_stays_string():
    """Tuple conversion is an implicit resolver on PLAIN scalars only
    (reference parity): quoting is the escape hatch for parenthesized
    strings like regexes."""
    h = load_hyperyaml('pattern: "(.*)"\nplain: (1, 2)\n')
    assert h["pattern"] == "(.*)"
    assert h["plain"] == (1, 2)


def test_extra_overrides_kwarg_resolves_refs_and_tags():
    """The extra_overrides kwarg merges BEFORE reference resolution (same
    as the CLI channel): dependent !ref values see the override, and
    tagged override values materialize."""
    h = load_hyperyaml("a: 3\nb: !ref <a>*2\n", extra_overrides={"a": 5})
    assert h["a"] == 5 and h["b"] == 10
    h = load_hyperyaml("a: 3\nb: 1\n",
                       extra_overrides="b: !ref <a>")
    assert h["b"] == 3


def test_circular_interpolated_ref_detected():
    with pytest.raises(ValueError, match="Circular"):
        load_hyperyaml("a: !ref <a>/x\n")


def test_module_tag_rejects_args():
    with pytest.raises(ValueError, match="Cannot pass args"):
        load_hyperyaml("m: !module:os.path {a: 1}\n")
    h = load_hyperyaml("m: !module:os.path\n")
    import os.path as osp
    assert h["m"] is osp


def test_encoder_decode_ndim_preserves_ragged_nesting():
    from mlvae_tpu.data.encoder import LabelEncoder

    enc = LabelEncoder()
    enc.update_from_iterable(["aa", "bb", "cc"])
    out = enc.decode_ndim([[0, 1], [2]])
    assert out == [["aa", "bb"], ["cc"]]
    assert enc.decode_ndim(1) == "bb"


def test_encoder_insert_label_normalizes_index():
    from mlvae_tpu.data.encoder import LabelEncoder

    enc = LabelEncoder()
    enc.update_from_iterable(["aa", "bb", "cc"])
    enc.insert_blank(index=-1)  # list.insert semantics: before the last
    assert enc.lab2ind["<blank>"] == 2
    assert sorted(enc.ind2lab) == [0, 1, 2, 3]  # contiguous, no key -1

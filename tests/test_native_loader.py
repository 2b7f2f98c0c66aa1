"""Native C++ loader vs the Python loader (the behavioral oracle) on
every bundled model, plus edge cases."""

import glob
import os

import numpy as np
import pytest

from tpuslam.data.loader import _load_obj_python, _load_off
from tpuslam.native import bindings

pytestmark = pytest.mark.skipif(
    not bindings.available(), reason="no native toolchain"
)

DATA = "/root/reference/data"


@pytest.mark.parametrize(
    "name", sorted(os.path.basename(p) for p in glob.glob(f"{DATA}/*.obj"))
)
def test_obj_parity(name):
    path = os.path.join(DATA, name)
    want = _load_obj_python(path)
    got = bindings.load_obj(path)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "name", sorted(os.path.basename(p) for p in glob.glob(f"{DATA}/*.off"))
)
def test_off_parity(name):
    path = os.path.join(DATA, name)
    want = _load_off(path)
    got = bindings.load_off(path)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_known_merge_counts():
    # the reference's observed merged sizes (testset.cpp:22, SURVEY §2.8)
    assert len(bindings.load_obj(f"{DATA}/bunny.obj")) == 14904
    assert len(bindings.load_obj(f"{DATA}/bird.obj")) == 35008
    assert len(bindings.load_off(f"{DATA}/noise_00_bunny.off")) == 11146


def test_missing_file_empty():
    assert bindings.load_obj("/nonexistent.obj").shape == (0, 3)
    assert bindings.load_off("/nonexistent.off").shape == (0, 3)


def test_negative_indices_and_quads(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "f 1 2 3 4\n"  # quad: 4 corners emitted, no fan split
        "f -1 -2 -3\n"
    )
    want = _load_obj_python(str(p))
    got = bindings.load_obj(str(p))
    assert len(got) == 7
    np.testing.assert_array_equal(got, want)


def test_face_free_obj_is_vertex_list(tmp_path):
    p = tmp_path / "pts.obj"
    p.write_text("v 1 2 3\nv 4 5 6\n")
    got = bindings.load_obj(str(p))
    np.testing.assert_allclose(got, [[1, 2, 3], [4, 5, 6]])


def test_malformed_off_header_is_empty_not_crash(tmp_path):
    # ADVICE r1: `OFF 99999999999 0 0` used to bad_alloc through the C ABI
    # and terminate the process.  Both parsers now build rows lazily, so
    # an absurd header count over a short body yields the partial prefix
    # actually present (r2 review: the old byte-bound guard rejected
    # mildly truncated files the oracle parsed).
    p = tmp_path / "bad.off"
    p.write_text("OFF 99999999999 0 0\n1 2 3\n")
    got = bindings.load_off(str(p))
    np.testing.assert_array_equal(got, _load_off(str(p)))
    assert got.shape == (1, 3)


def test_face_over_64_corners_keeps_python_parity(tmp_path):
    # ADVICE r1: faces used to be truncated at 64 corners in the native
    # parser while the Python oracle keeps all of them.
    p = tmp_path / "big.obj"
    lines = [f"v {i} {i} {i}" for i in range(100)]
    lines.append("f " + " ".join(str(i + 1) for i in range(100)))
    p.write_text("\n".join(lines) + "\n")
    want = _load_obj_python(str(p))
    got = bindings.load_obj(str(p))
    assert got.shape == (100, 3)
    np.testing.assert_array_equal(got, want)


def _loads(path):
    """(native, oracle) results for the same file, by extension."""
    if str(path).endswith(".obj"):
        native = bindings.load_obj(str(path))
        try:
            oracle = _load_obj_python(str(path))
        except Exception:
            oracle = np.zeros((0, 3), dtype=np.float32)
    else:
        native = bindings.load_off(str(path))
        try:
            oracle = _load_off(str(path))
        except Exception:
            oracle = np.zeros((0, 3), dtype=np.float32)
    return native, oracle


@pytest.mark.parametrize(
    "name,text",
    [
        # malformed vertex payload: oracle raises => whole file empty
        ("bad_vert.obj", "v 1.0 2.0 abc\nv 3 4 5\nf 1 2 1\n"),
        ("short_vert.obj", "v 1.0 2.0\nv 3 4 5\nv 6 7 8\nf 1 2 3\n"),
        # face token that int() rejects (float-looking index)
        ("float_face.obj", "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1.5 2 3\n"),
        ("alpha_face.obj", "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 abc\n"),
        # trailing garbage fused to a number: float('1.0abc') raises
        ("fused_vert.obj", "v 1.0abc 2 3\n"),
        # marker parity: tab after v / leading space are NOT vertices
        ("tab_vert.obj", "v\t1 2 3\nv 4 5 6\n"),
        ("indent_vert.obj", " v 1 2 3\nv 4 5 6\n"),
        # empty corner parts are skipped like the oracle
        ("slash_face.obj", "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3 //9\n"),
        # malformed OFF vertex: oracle raises => empty (NOT partial)
        ("bad_vert.off", "OFF 3 0 0\n0 0 0\n1 x 1\n2 2 2\n"),
        ("short_vert.off", "OFF 2 0 0\n0 0\n1 1 1\n"),
        # counts line consumed whole: extra tokens are counts, not coords
        ("extra_counts.off", "OFF\n3 0 0 99\n0 0 0\n1 1 1\n2 2 2\n"),
        # non-integer count: oracle raises => empty
        ("bad_count.off", "OFF 3.0 0 0\n0 0 0\n1 1 1\n2 2 2\n"),
        # EOF mid-list: oracle keeps the partial prefix
        ("partial.off", "OFF 5 0 0\n0 0 0\n1 1 1\n"),
        # inline comments after coordinates
        ("comments.off", "OFF 2 0 0\n0 0 0 # a\n1 1 1 # b\n"),
        # truncated file under a big-but-plausible header: partial prefix
        # (the old nv-vs-remaining-bytes guard wrongly emptied these)
        (
            "trunc_big.off",
            "OFF 1000 0 0\n" + "".join(f"{i} 0 0\n" for i in range(100)),
        ),
        # Python float() grammar, not strtof's: C99 hex floats rejected
        ("hex_vert.obj", "v 0x1p3 2 3\n"),
        ("hex_off.off", "OFF 1 0 0\n0x10 0 0\n"),
        # ...strtof's nan(payload) form rejected
        ("nan_payload.obj", "v nan(123) 2 3\n"),
        # ...but inf/nan spellings both accept
        ("inf_vert.obj", "v inf -Infinity nan\nf 1 1 1\n"),
        # ...PEP-515 underscores accepted (float('1_0') == 10.0)
        ("underscore_vert.obj", "v 1_0 2.5_5 3e1_0\n"),
        ("underscore_count.off", "OFF 1_0 0 0\n0 0 0\n1 1 1\n"),
        # ...and misplaced underscores rejected like float()/int()
        ("double_underscore.obj", "v 1__0 2 3\n"),
        ("lead_underscore.obj", "v _1 2 3\n"),
        ("trail_underscore.obj", "v 1_ 2 3\n"),
        # doubly-negative face index: numpy gather wraps one extra turn
        ("wrap_face.obj", "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
                          "v 2 2 2\nf 1 2 -10\n"),
        # ...but below -nverts the oracle IndexErrors => empty
        ("toowrap_face.obj", "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
                             "v 2 2 2\nf 1 2 -11\n"),
        # index beyond long precision: oracle's arbitrary-precision int
        # IndexErrors, native saturates then bound-checks => both empty
        ("huge_face.obj",
         "v 0 0 0\nv 1 0 0\nf 1 2 99999999999999999999999\n"),
    ],
)
def test_malformed_file_parity(tmp_path, name, text):
    """The native parser must be observably identical to the Python
    oracle on malformed input: reject-the-whole-file where the oracle
    raises, partial where the oracle returns a prefix — never silently
    shifted or truncated geometry (r2 review findings)."""
    p = tmp_path / name
    p.write_text(text)
    native, oracle = _loads(p)
    assert native.shape == oracle.shape, (name, native.shape, oracle.shape)
    np.testing.assert_array_equal(native, oracle)


def test_float_token_grammar_fuzz_parity(tmp_path):
    """Every token either parses identically in both loaders or rejects
    the file in both — sweeping the float()/strtof grammar differences
    (hex, nan payloads, underscores, signs, exponents, whitespace-free
    oddities)."""
    tokens = [
        "1", "+1", "-1", "1.", ".5", "-.5", "+.5", "1.5", "1e3", "1E3",
        "1e+3", "1e-3", "1.5e-3", ".5e2", "1.e2", "inf", "-inf", "+inf",
        "INF", "Infinity", "-INFINITY", "nan", "NaN", "-nan", "+NAN",
        "1_0", "1_000.000_1", "3e1_0", "1.2_5", "0_1",
        # rejects (both sides)
        "", ".", "+", "-", "e3", ".e3", "1e", "1e+", "1x", "x1",
        "0x10", "0X10", "0x1p3", "-0x1.8p1", "nan(123)", "NAN(chars)",
        "1__0", "_1", "1_", "1._0", "1_.0", "_", "1e_3", "1e3_",
        "1.5.5", "1,5", "++1", "--1", "1-", "infinityy", "na", "in",
        "1d5", "0b101", "0o17", "1j",
    ]
    for k, tok in enumerate(tokens):
        p = tmp_path / f"fz{k}.obj"
        p.write_text(f"v {tok} 1 2\n")
        native, oracle = _loads(p)
        assert native.shape == oracle.shape, (tok, native.shape, oracle.shape)
        np.testing.assert_array_equal(native, oracle, err_msg=repr(tok))


def test_int_token_grammar_fuzz_parity(tmp_path):
    """Same sweep for int() tokens, via OFF header counts (accepted
    values change how many vertex rows are consumed) and face indices."""
    tokens = [
        "2", "+2", "02", "1_0", "2_",  "_2", "2__2", "2.0", "2e1",
        "0x2", "abc", "", "-1", "99999999999999999999999",
    ]
    for k, tok in enumerate(tokens):
        p = tmp_path / f"fzi{k}.off"
        p.write_text(f"OFF {tok} 0 0\n0 0 0\n1 1 1\n2 2 2\n4 4 4\n")
        native, oracle = _loads(p)
        assert native.shape == oracle.shape, (tok, native.shape, oracle.shape)
        np.testing.assert_array_equal(native, oracle, err_msg=repr(tok))
        f = tmp_path / f"fzf{k}.obj"
        f.write_text(f"v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 {tok}\n")
        native, oracle = _loads(f)
        assert native.shape == oracle.shape, (tok, native.shape, oracle.shape)
        np.testing.assert_array_equal(native, oracle, err_msg=repr(tok))


@pytest.mark.parametrize("sep", ["\n", "\r", "\r\n"])
def test_newline_convention_parity(tmp_path, sep):
    """The Python oracle reads text mode with universal newlines ('\\r',
    '\\r\\n', and '\\n' all break lines), so the native parser must
    split identically — '\\n'-only splitting merges classic-Mac lines
    into divergent non-empty geometry (r2 review finding)."""
    obj = sep.join(["v 1 2 3", "v 4 5 6", "v 7 8 9", "f 1 2 3", ""])
    p = tmp_path / "nl.obj"
    p.write_bytes(obj.encode())
    native, oracle = _loads(p)
    assert oracle.shape == (3, 3)  # sanity: the oracle sees 3 corners
    assert native.shape == oracle.shape
    np.testing.assert_array_equal(native, oracle)

    off = sep.join(["OFF 3 0 0", "0 0 1", "0 1 0 # c", "1 0 0", ""])
    q = tmp_path / "nl.off"
    q.write_bytes(off.encode())
    native, oracle = _loads(q)
    assert oracle.shape == (3, 3)
    assert native.shape == oracle.shape
    np.testing.assert_array_equal(native, oracle)

"""md5vec: the vectorized single-block MD5 must be a bit-exact twin of
``int(hashlib.md5(msg).hexdigest()[:15], 16)`` — the hash64/oracle
contract — for every message shape the walk draws can produce.
No Spark session needed: pure numpy vs hashlib.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pytest

from terrorblade_spark.operators.md5vec import md5_hash60, md5_hash60_draws


def _ref(msg: str) -> int:
    return int(hashlib.md5(msg.encode()).hexdigest()[:15], 16)


def test_random_ascii_messages_match_hashlib():
    rng = random.Random(1311)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789/_-. ~!@#$%^&*()"
    msgs = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 55)))
        for _ in range(2000)
    ]
    msgs += ["", "a", "a" * 55, "walk/0/1", "seed/9223372036854775807/15"]
    got = md5_hash60(np.array(msgs))
    exp = np.array([_ref(m) for m in msgs], dtype=np.int64)
    assert (got == exp).all()


def test_draws_match_hashlib_across_digit_widths():
    # every decimal width an int64 walk id can take, plus boundaries
    ids = [0, 1, 9] + [10**j for j in range(1, 19)] + [
        10**j - 1 for j in range(2, 19)
    ] + [2**62, 2**63 - 1, 123456789012345678]
    arr = np.array(ids, dtype=np.int64)
    for prefix, suffix in [("walk/", "/1"), ("walk/", "/15"), ("", ""), ("s-eed./", "/999")]:
        got = md5_hash60_draws(prefix, arr, suffix)
        exp = np.array(
            [_ref(f"{prefix}{w}{suffix}") for w in ids], dtype=np.int64
        )
        assert (got == exp).all(), (prefix, suffix)


def test_two_block_messages_are_rejected():
    with pytest.raises(ValueError):
        md5_hash60(np.array(["x" * 56]))
    with pytest.raises(ValueError):
        # 50-char seed + 19 digits crosses the single-block limit
        md5_hash60_draws("s" * 50, np.array([10**18], dtype=np.int64), "/1")


def test_empty_input():
    assert md5_hash60(np.array([], dtype="U1")).shape == (0,)
    assert md5_hash60_draws("p/", np.array([], dtype=np.int64), "/1").shape == (0,)


def test_walks_draw_contract_shape():
    # the exact message the distributed loop hashes: hash64(seed/wid/t)
    wid = np.array([17, 40, 123], dtype=np.int64)
    got = md5_hash60_draws("walk/", wid, "/3")
    exp = np.array([_ref(f"walk/{w}/3") for w in wid], dtype=np.int64)
    assert (got == exp).all()

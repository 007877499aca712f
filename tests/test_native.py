"""Native C++ fastload vs pure-python parity (foodrec_tpu/native)."""

import numpy as np
import pytest

from foodrec_tpu import native


@pytest.fixture(scope="module")
def have_native():
    if native.lib() is None:
        pytest.skip("no g++ / native lib unavailable")
    return True


def test_parse_negatives(tmp_path, have_native):
    path = tmp_path / "x.negative"
    rows = [[5, 3, 9, 1], [0, 2, 4, 8], [7, 7, 7, 7]]
    with open(path, "w") as f:
        for r, row in enumerate(rows):
            f.write(f"(u:[{r}])\t" + "\t".join(map(str, row)) + "\n")
    got = native.parse_negatives(str(path), 4)
    np.testing.assert_array_equal(got, np.asarray(rows, np.int32))


def test_parse_negatives_ragged_falls_back(tmp_path, have_native):
    path = tmp_path / "bad.negative"
    path.write_text("(u:[0])\t1\t2\n(u:[1])\t3\n")
    assert native.parse_negatives(str(path), 2) is None


def test_build_eval_set_matches_python(have_native):
    from foodrec_tpu.data.device import EvalSet, build_eval_set

    rng = np.random.default_rng(0)
    U, K = 9, 12
    ratings = [rng.choice(50, size=int(rng.integers(1, 5)),
                          replace=False).tolist() for _ in range(U)]
    # plant duplicates: first negative equals the first positive
    negatives = []
    for p in ratings:
        negs = rng.choice(50, size=K, replace=False).tolist()
        negs[0] = p[0]
        negatives.append(negs)

    es = build_eval_set(list(range(U)), ratings, negatives)

    # python oracle (the pre-native path)
    for u in range(U):
        pos = ratings[u]
        pos_set, removed, negs = set(pos), set(), []
        for x in negatives[u]:
            if x in pos_set and x not in removed:
                removed.add(x)
                continue
            negs.append(x)
        expect = pos + negs
        assert es.n_pos[u] == len(pos)
        assert es.n_cand[u] == len(expect)
        np.testing.assert_array_equal(es.cand[u, :len(expect)], expect)


def test_pack_bitmap_matches_python(have_native):
    rng = np.random.default_rng(1)
    n_users, n_items = 7, 100
    u = rng.integers(0, n_users, 50)
    i = rng.integers(0, n_items, 50)
    got = native.pack_bitmap(u, i, n_users, n_items)
    words = -(-n_items // 32)
    ref = np.zeros((n_users, words), dtype=np.uint32)
    np.bitwise_or.at(ref, (u, i >> 5),
                     np.uint32(1) << (i & 31).astype(np.uint32))
    np.testing.assert_array_equal(got, ref)

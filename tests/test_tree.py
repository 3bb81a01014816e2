

def test_cart_heap_tie_breaks_to_lowest_position():
    """r14 pin: when two nodes' best gains tie BITWISE (mirror-image
    histograms), the best-first heap must pick the lowest absolute
    split position — the order the SQL replays use
    (ORDER BY gain DESC, position) — not insertion order. Pinned
    outputs on two symmetric histograms."""
    import numpy as np

    from optbinning_spark.core.tree import cart_splits

    v = np.arange(8, dtype=float)
    W = np.array([[9, 1], [1, 9], [9, 1], [1, 9],
                  [9, 1], [1, 9], [9, 1], [1, 9]], float)
    assert list(cart_splits(v, W, max_leaf_nodes=3)) == [0.5, 1.5]
    W2 = np.array([[9, 1], [1, 9], [5, 5], [5, 5],
                   [5, 5], [5, 5], [1, 9], [9, 1]], float)
    assert list(cart_splits(v, W2, max_leaf_nodes=3)) == [0.5, 6.5]

"""Bucket list parity (renderer.d:194-213)."""

from chess2rt_tpu.render.buckets import get_buckets_list


def test_zigzag_order_and_clipping():
    # 100x80 at bucket 48 -> 3x2 buckets
    b = get_buckets_list(100, 80, 48)
    assert len(b) == 6
    # row 0 left-to-right
    assert (b[0].x0, b[0].y0) == (0, 0)
    assert (b[1].x0, b[1].y0) == (48, 0)
    assert (b[2].x0, b[2].y0) == (96, 0)
    assert b[2].x1 == 100  # clipped
    # row 1 right-to-left (zigzag)
    assert (b[3].x0, b[3].y0) == (96, 48)
    assert (b[5].x0, b[5].y0) == (0, 48)
    assert b[3].y1 == 80  # clipped


def test_exact_cover():
    covered = set()
    for bk in get_buckets_list(130, 70, 48):
        for y in range(bk.y0, bk.y1):
            for x in range(bk.x0, bk.x1):
                assert (x, y) not in covered
                covered.add((x, y))
    assert len(covered) == 130 * 70


def test_default_matches_reference_bucket_size():
    b = get_buckets_list(640, 480)  # default 48 (global_settings.d:16)
    assert len(b) == ((640 - 1) // 48 + 1) * ((480 - 1) // 48 + 1)

"""Scraper parsing + resume logic, offline (network isolated behind
injectable fetchers; reference dataset_process/download_{image,check}.py)."""

import os

from foodrec_tpu.data import scrapers


HTML = """
<html><body>
<img src="https://cdn.example.com/banner.png">
<div class="wrap primary-image extra"><a><img alt="x"
 src="https://img.example.com/recipe-123.jpg?w=960"></a></div>
<img src="https://cdn.example.com/other.jpg">
</body></html>
"""


def test_extract_primary_image_url():
    assert scrapers.extract_primary_image_url(HTML) == (
        "https://img.example.com/recipe-123.jpg?w=960")
    # falls back to first jpg when no primary-image div
    assert scrapers.extract_primary_image_url(
        '<img src="https://x/y.jpg">') == "https://x/y.jpg"
    assert scrapers.extract_primary_image_url("<html></html>") is None


def test_pending_and_skip(tmp_path):
    out = tmp_path / "imgs"
    out.mkdir()
    (out / "1.jpg").write_bytes(b"x")
    skip = tmp_path / "no_image.txt"
    skip.write_text("2\n")
    items = [(1, "u1"), (2, "u2"), (3, "u3")]
    todo = scrapers.pending_items(items, str(out), str(skip))
    assert todo == [(3, "u3")]


def test_download_images_offline(tmp_path):
    pages = {"u3": HTML, "u4": "<html>nothing</html>", "u5": None}

    def fake_page(url):
        if pages[url] is None:
            raise OSError("timeout")
        return pages[url]

    def fake_img(url):
        return b"JPEGDATA"

    def dl(task, out_dir):
        return scrapers.download_one(task, out_dir, fetch_page=fake_page,
                                     fetch_image=fake_img)

    out = tmp_path / "imgs"
    skip = tmp_path / "no_image.txt"
    res = scrapers.download_images(
        [(3, "u3"), (4, "u4"), (5, "u5")], str(out), str(skip),
        workers=1, download=dl)
    assert res["ok"] == [3]
    assert res["no_image"] == [4]
    assert res["error"] == [5]
    assert (out / "3.jpg").read_bytes() == b"JPEGDATA"
    assert scrapers.load_skip_list(str(skip)) == {"4"}
    # resume: nothing left to do for 3 and 4
    res2 = scrapers.download_images(
        [(3, "u3"), (4, "u4")], str(out), str(skip), workers=1, download=dl)
    assert res2 == {"ok": [], "no_image": [], "error": []}

"""Comment scrub: staged removal semantics, counts, null discipline."""

from __future__ import annotations

import pyarrow as pa


def test_comment_scrub_staged_semantics(ray_session):
    import ray.data

    from quichash_ray.pipelines.codeclean import comment_scrub

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "int a; /* x // not a line comment */ int b; // tail",
                    "multi /* line\nblock */ code # hash tail",
                    "no comments at all",
                    None,
                    "a /* one */ b /* two */ c // three\n# four",
                ]
            ),
        }
    )
    out = (
        comment_scrub(ray.data.from_arrow(t))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 1: the // inside the block is consumed by the block pass
    assert out.loc[1, ["n_block", "n_line", "n_hash"]].tolist() == [1, 1, 0]
    assert out.loc[1, "clean_text"] == "int a;  int b; "
    # doc 2: block spans a newline; hash comment survives to stage 3
    assert out.loc[2, ["n_block", "n_line", "n_hash"]].tolist() == [1, 0, 1]
    assert out.loc[2, "clean_text"] == "multi  code "
    # doc 3: untouched
    assert out.loc[3, "comment_chars"] == 0
    assert out.loc[3, "clean_text"] == "no comments at all"
    # doc 4: null text -> zero counts, null clean_text
    assert out.loc[4, ["n_block", "n_line", "n_hash", "comment_chars"]].tolist() == [0, 0, 0, 0]
    assert out.loc[4, "clean_text"] is None
    # doc 5: two blocks, one line, one hash
    assert out.loc[5, ["n_block", "n_line", "n_hash"]].tolist() == [2, 1, 1]
    # comment_chars telescopes to len(text) - len(clean)
    src = t["text"][4].as_py()
    assert out.loc[5, "comment_chars"] == len(src) - len(out.loc[5, "clean_text"])

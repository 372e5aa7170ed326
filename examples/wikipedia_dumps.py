"""The reference's "wikipedia-dumps" example shape (BASELINE.json:6),
re-expressed on this engine: strip navigation/citation boilerplate
from wiki-article markup and collect (title, clean_text) records.

Run:  python examples/wikipedia_dumps.py           # serial kernel
      python examples/wikipedia_dumps.py --spark   # same rules at scale
"""

from __future__ import annotations

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from inxs_spark.compat import Any, Ref, Rule, Transformation, lib, parse

ARTICLES = [
    """<article>
      <header>WikiProject | edit | history</header>
      <h1>Alpha</h1>
      <p>Alpha is the first letter.<ref>[1]</ref> It leads the alphabet.</p>
      <footer>Categories: Letters</footer>
    </article>""",
    """<article>
      <header>nav</header>
      <h1>Beta</h1>
      <p>Beta follows alpha.<ref>[2]</ref></p>
      <footer>stub</footer>
    </article>""",
]


def wiki_transformation(result_object: str = "context") -> Transformation:
    """result_object='context' → (title, clean_text) records (serial
    idiom); 'tree' → the cleaned DOM (what the Spark pipeline's span
    walk consumes)."""
    el = Ref("element")
    steps = [
        Rule("h1", (lib.get_text, lib.put_variable("title"))),
        [
            Rule(Any("header", "footer"), (lib.append("trash", el),)),
            Rule("ref", (lib.append("cites", el),)),
        ],
        lib.remove_elements("trash"),
        lib.remove_elements("cites", preserve_tail=True),
    ]
    if result_object == "context":
        steps.append(Rule("/", (lib.extract_text, lib.put_variable("clean_text"))))
    return Transformation(
        *steps, name="wikipedia-dumps", result_object=result_object
    )


def main() -> None:
    if "--spark" in sys.argv:
        from inxs_spark.plans.extract_pipeline import extract_df
        from inxs_spark.sources.session import get_spark

        spark = get_spark(master="local[4]")
        df = spark.createDataFrame(
            [(f"doc{i}", 0, a) for i, a in enumerate(ARTICLES)],
            "conv_id string, turn_idx int, text string",
        )
        extract_df(df, transformation=wiki_transformation("tree")) \
            .select("conv_id", "extracted_text").show(truncate=70)
        spark.stop()
        return
    t = wiki_transformation()
    for article in ARTICLES:
        ctx = t(parse(article))
        print(f"{ctx.title}: {' '.join(ctx.clean_text.split())}")


if __name__ == "__main__":
    main()

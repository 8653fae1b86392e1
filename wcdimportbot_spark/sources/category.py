"""Category recursive scan (S3/J8): transitive closure over category
membership, as a bounded driver-side fixpoint loop of DataFrame joins —
Spark's standard recursive-CTE idiom (the driver loop schedules jobs; all
data stays distributed).

Reference: ``Category(title).articles(recurse=True)``
(``src/__init__.py:229-254``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def category_closure(
    category_links: DataFrame,
    roots: DataFrame,
    max_depth: int = 20,
) -> DataFrame:
    """Transitive closure from ``roots(category)`` over
    ``category_links(parent, child)`` → (root, member, depth).

    Each iteration is one hash join + union + dropDuplicates; terminates at
    fixpoint or ``max_depth`` (cycles in category graphs are real — the
    visited-set semantics of dropDuplicates breaks them). The frontier
    optimization joins only newly-discovered nodes, so total work is
    O(edges x depth-of-new-discoveries), not O(closure x depth)."""
    closure = roots.select(
        F.col("category").alias("root"),
        F.col("category").alias("member"),
        F.lit(0).alias("depth"),
    )
    frontier = closure
    for depth in range(1, max_depth + 1):
        expanded = (
            frontier.join(
                category_links, frontier.member == category_links.parent
            )
            .select(
                "root",
                F.col("child").alias("member"),
                F.lit(depth).alias("depth"),
            )
        )
        new = expanded.join(
            closure.select("root", "member"), ["root", "member"], "left_anti"
        ).dropDuplicates(["root", "member"])
        # one action per level; localCheckpoint truncates the growing
        # lineage so level N+1 does not replay levels 1..N
        new = new.localCheckpoint(eager=True)
        if new.isEmpty():
            break
        closure = closure.unionByName(new)
        frontier = new
    return closure


def articles_in_category(
    closure: DataFrame, pages: DataFrame, page_categories: DataFrame
) -> DataFrame:
    """Join the closure to pages through page→category membership: the
    ``get_and_extract_pages_by_category`` result set."""
    members = closure.select("root", F.col("member").alias("category"))
    return (
        page_categories.join(members, "category")
        .select("root", "page_id")
        .dropDuplicates(["root", "page_id"])
        .join(pages, "page_id")
    )

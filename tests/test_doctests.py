"""Execute the package's docstring examples — the Spark-side answer to the
reference's doctest suite (reference runs doctests on every public
docstring, see SURVEY §5 / reference pyproject.toml --doctest-modules).

Session-bound examples get the shared test SparkSession injected as the
``spark`` global; everything else the example needs must already be a name
in its own module (doctest executes with the module __dict__ as globals),
which keeps every example copy-pasteable for a user with a session open.
"""

import doctest

import nested_pandas_spark.nestedframe.core as core
import nested_pandas_spark.operators.asof as asof
import nested_pandas_spark.operators.crossmatch as crossmatch
import nested_pandas_spark.operators.map_rows as map_rows
import nested_pandas_spark.operators.aggregates as aggregates
import nested_pandas_spark.operators.packer as packer
import nested_pandas_spark.operators.timeseries as timeseries
import nested_pandas_spark.pipeline.corpus as corpus
import nested_pandas_spark.pipeline.dedup as dedup
import nested_pandas_spark.pipeline.similarity as similarity
import nested_pandas_spark.pipeline.text as text
import nested_pandas_spark.pipeline.wordpiece as wordpiece
import nested_pandas_spark.plans.inspect as plan_inspect
import nested_pandas_spark.tuning as tuning

MODULES = [core, packer, asof, dedup, text, corpus, similarity, tuning,
           map_rows, plan_inspect, timeseries, crossmatch, aggregates,
           wordpiece]

# examples must exist where users look first; grow this floor as docstrings
# gain examples, never shrink it
MIN_EXAMPLED_DOCSTRINGS = 15


def test_package_doctests(spark):
    finder = doctest.DocTestFinder(exclude_empty=True)
    runner = doctest.DocTestRunner(
        optionflags=doctest.NORMALIZE_WHITESPACE | doctest.ELLIPSIS
    )
    ran = 0
    for mod in MODULES:
        for t in finder.find(mod, extraglobs={"spark": spark}):
            if not t.examples:
                continue
            runner.run(t)
            ran += 1
    results = runner.summarize(verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures"
    assert ran >= MIN_EXAMPLED_DOCSTRINGS, (
        f"only {ran} docstrings carry runnable examples "
        f"(floor is {MIN_EXAMPLED_DOCSTRINGS})"
    )

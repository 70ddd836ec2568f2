package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The executable bound on the all-pairs verify primitives: correct
  * pair enumeration under the cap, refusal above it.
  */
class BoundedPairsSpec extends SparkSpec {
  import spark.implicits._

  test("enumerates each unordered pair once with suffixed columns") {
    val d = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "p")
    val pairs = BoundedPairs.allPairs(d, "id")
    pairs.columns.sorted shouldBe Array("id_a", "id_b", "p_a", "p_b")
    val got = pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    got shouldBe (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)).toArray
  }

  test("THROWS instead of running all-pairs over a slice above the cap") {
    val big = spark.range(50).select(col("id"), lit("x").as("p"))
    val ex = intercept[IllegalArgumentException] {
      BoundedPairs.allPairs(big, "id", maxRows = 49)
    }
    ex.getMessage should include("quadratic")
    ex.getMessage should include("50 rows > cap 49")
  }

  test("rejects an id column that is not in the slice") {
    val d = Seq((1L, "a")).toDF("id", "p")
    intercept[IllegalArgumentException] {
      BoundedPairs.allPairs(d, "doc_id")
    }
  }

  test("joins a snapshot of the slice, not re-executions of its plan") {
    // the determinism guarantee behind the cap: the counted row set
    // and BOTH join branches must be the same materialized snapshot —
    // a nondeterministic slice (sample, rand-filter) re-executed per
    // branch could pass the cap on one row set and join another. Pin
    // it structurally: the source plan must not appear in the pair
    // join; both sides scan the checkpointed RDD.
    val d = spark.range(10).select(col("id"), lit("p").as("p"))
    val pairs = BoundedPairs.allPairs(d, "id")
    val plan = pairs.queryExecution.optimizedPlan.toString
    plan should not include "Range"
    plan should include("LogicalRDD")
  }
}

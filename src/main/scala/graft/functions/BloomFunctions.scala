package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.ColumnShim

/** Column wrappers over the Catalyst bloom-filter pair that powers Spark's
  * own runtime-filter join pruning (`InjectRuntimeFilter` — the machinery
  * RuntimeFilterSpec pins on the ETL2 join): `BloomFilterAggregate` builds
  * the filter DISTRIBUTEDLY (partial sketches merged like any other
  * aggregate, so no driver-side set materialization), and
  * `BloomFilterMightContain` probes it with full `doGenCode`, so a probe
  * stays inside WholeStageCodegen.
  *
  * Both expressions take a pre-hashed 64-bit key: pass `xxhash64(col)` on
  * BOTH the build and probe side (the same contract Spark's planner uses
  * when it injects these around a shuffle join).
  */
object BloomFunctions {

  /** Aggregate column building a bloom filter over `hashed` (a 64-bit hash
    * column, e.g. `xxhash64(...)`); yields one BinaryType blob of ~numBits/8
    * bytes. `numBits` is a hard size cap independent of the data — the
    * property that makes the blob shippable when the exact key set is not.
    */
  def bloom_agg(hashed: Column, estimatedItems: Long, numBits: Long): Column =
    ColumnShim.column(new BloomFilterAggregate(
      ColumnShim.expression(hashed),
      Literal(estimatedItems),
      Literal(numBits)).toAggregateExpression())

  /** Membership probe against a built bloom blob: false positives possible
    * (rate set by numBits/items), false negatives never — so it is safe as
    * a PREFILTER in front of an exact confirming join.
    */
  def might_contain(bloom: Array[Byte], hashed: Column): Column =
    ColumnShim.column(BloomFilterMightContain(
      Literal(bloom), ColumnShim.expression(hashed)))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-packing plans over file metadata — the PLANNING half of
  * compaction, upstream of the rewrite q111/q127 execute: decide which
  * small files coalesce into which target-sized output before touching a
  * byte of data.
  */
object Packing {

  /** FIRST-FIT-DECREASING compaction plan per partition: files sort by
    * size descending (ties by id) and each takes the first open bin with
    * room, else opens a new one — the classic 11/9·OPT+1 heuristic, and
    * deterministic, so the oracle replays it bin for bin. Packing is
    * scoped to the partition column because that is how real compaction
    * works (outputs can't span partitions) AND what bounds the
    * sequential fold: the per-partition file list is METADATA-sized by
    * contract (the q353 per-key series bound), while partitions
    * themselves parallelize freely. Files larger than `capacity` are
    * refused loudly — a plan that silently splits or overflows is worse
    * than no plan.
    */
  def ffdPlan(
      df: DataFrame,
      partCol: String,
      idCol: String,
      sizeCol: String,
      capacity: Long): DataFrame = {
    require(capacity >= 1)
    val base = df.select(col(partCol).as("part"),
      col(idCol).cast("long").as("id"), col(sizeCol).cast("long").as("sz"))
    val first = element_at(col("__s"), 1)
    val folded = aggregate(
      expr("slice(__s, 2, greatest(size(__s) - 1, 0))"),
      struct(
        array(lit(capacity) + first.getField("negsz")).as("rem"),
        array(struct(first.getField("id").as("id"),
          lit(1L).as("bin"))).as("out")),
      (acc, e) => {
        val sz = -e.getField("negsz")
        val rem = acc.getField("rem")
        val fits = filter(sequence(lit(1L), size(rem).cast("long")),
          i => element_at(rem, i.cast("int")) >= sz)
        val chosen = when(size(fits) > 0, element_at(fits, 1))
          .otherwise(size(rem).cast("long") + 1L)
        val newRem = when(chosen > size(rem).cast("long"),
            concat(rem, array(lit(capacity) - sz)))
          .otherwise(transform(sequence(lit(1L), size(rem).cast("long")),
            i => when(i === chosen,
              element_at(rem, i.cast("int")) - sz)
              .otherwise(element_at(rem, i.cast("int")))))
        struct(newRem.as("rem"),
          concat(acc.getField("out"),
            array(struct(e.getField("id").as("id"), chosen.as("bin"))))
            .as("out"))
      })
    val packed = base
      .groupBy(col("part"))
      .agg(sort_array(collect_list(
        struct((-col("sz")).as("negsz"), col("id")))).as("__s"))
      .select(col("part"), explode(folded.getField("out")).as("o"))
      .select(col("part"), col("o.id").as("id"), col("o.bin").as("bin"))
    val oversize = base.filter(col("sz") > capacity)
    // loud refusal is cheap: the count is an accumulator-free metadata
    // check over the same scan the plan makes anyway
    require(oversize.isEmpty,
      s"ffdPlan: files larger than capacity=$capacity exist")
    packed.join(base, Seq("part", "id"))
      .select(col("part"), col("id"), col("sz").as("size"), col("bin"))
  }
}

package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Pure ScalaCheck properties for the Misra-Gries aggregate, driven
  * through its REAL update/merge/serialize path (BoundReference child +
  * InternalRow, no Spark session): the mergeable-summaries guarantees
  * must hold for ANY chunking of the input into partial buffers.
  */
object MisraGriesProps extends Properties("MisraGriesSummary") {

  private def agg(k: Int) =
    MisraGriesSummary(BoundReference(0, StringType, nullable = true), k)

  /** Run items through `chunks` partial buffers, then merge left-fold. */
  private def run(k: Int, chunks: Seq[Seq[String]]): Map[String, Long] = {
    val a = agg(k)
    val partials = chunks.map { c =>
      c.foldLeft(a.createAggregationBuffer()) { (b, item) =>
        a.update(b, InternalRow(UTF8String.fromString(item)))
      }
    }
    val merged = partials
      .foldLeft(a.createAggregationBuffer())((acc, p) => a.merge(acc, p))
    import scala.jdk.CollectionConverters._
    merged.asScala.toMap.map { case (s, n) => (s, n: Long) }
  }

  private val itemsGen: Gen[List[String]] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.oneOf("a", "b", "c"),
      3 -> Gen.oneOf("d", "e", "f", "g", "h"),
      1 -> Gen.choose(0, 50).map(i => s"tail-$i")))
  private val kGen: Gen[Int] = Gen.choose(1, 8)
  private val chunksGen: Gen[Int] = Gen.choose(1, 5)

  private def chunked(items: List[String], n: Int): Seq[Seq[String]] =
    if (items.isEmpty) Seq(Seq.empty)
    else items.grouped(math.max(1, items.size / n)).toSeq

  property("buffer never exceeds k entries") =
    Prop.forAll(itemsGen, kGen, chunksGen) { (items, k, nc) =>
      run(k, chunked(items, nc)).size <= k
    }

  property("superset: every item with count > n/(k+1) survives ANY chunking") =
    Prop.forAll(itemsGen, kGen, chunksGen) { (items, k, nc) =>
      val got = run(k, chunked(items, nc)).keySet
      val n = items.size
      val frequent = items.groupBy(identity).view.mapValues(_.size)
        .filter { case (_, c) => c > n.toDouble / (k + 1) }.keySet
      frequent.subsetOf(got)
    }

  property("counters are lower bounds within n/(k+1) of the truth") =
    Prop.forAll(itemsGen, kGen, chunksGen) { (items, k, nc) =>
      val got = run(k, chunked(items, nc))
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val slack = items.size.toDouble / (k + 1)
      got.forall { case (item, c) =>
        val t = truth.getOrElse(item, 0L)
        c <= t && c >= t - slack
      }
    }

  property("serialize/deserialize round-trips any buffer, long items included") =
    Prop.forAll(itemsGen, kGen) { (items, k) =>
      val a = agg(k)
      val buf = (("x" * 70000) :: items)
        .foldLeft(a.createAggregationBuffer()) { (b, item) =>
          a.update(b, InternalRow(UTF8String.fromString(item)))
        }
      val back = a.deserialize(a.serialize(buf))
      back == buf
    }

  property("null inputs are ignored") =
    Prop.forAll(itemsGen, kGen) { (items, k) =>
      val a = agg(k)
      val withNulls = a.createAggregationBuffer()
      items.foreach { i =>
        a.update(withNulls, InternalRow(UTF8String.fromString(i)))
        a.update(withNulls, InternalRow(null))
      }
      val without = items.foldLeft(a.createAggregationBuffer()) { (b, i) =>
        a.update(b, InternalRow(UTF8String.fromString(i)))
      }
      withNulls == without
    }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary payload schema survives the asset path") {
    val a = Multimodal.assets(spark, SF)
    assert(a.schema("payload").dataType.typeName == "binary")
    val first = a.filter(_.asset_id == 0L).head()
    assert(first.meta.kind == "text" && first.meta.nBytes == first.payload.length)
  }

  test("feature extraction is deterministic, batched, and complete") {
    val f1 = Multimodal.extractFeatures(Multimodal.assets(spark, SF))
      .collect().sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(Multimodal.assets(spark, SF).repartition(7))
      .collect().sortBy(_.asset_id)
    assert(f1.length == 500 && f2.length == 500) // no rows lost to batching
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.asset_id == b.asset_id && a.width == b.width &&
        a.features.sameElements(b.features)) // partitioning-independent
    }
    // histogram is L1-normalized
    assert(math.abs(f1.head.features.map(_.toDouble).sum - 1.0) < 1e-5)
    assert(f1.head.features.length == Multimodal.FEATURE_DIM)
  }

  test("stub decode derives dimensions from content only") {
    val (w1, h1, f1) = Multimodal.decodeStub("hello".getBytes)
    val (w2, h2, f2) = Multimodal.decodeStub("hello".getBytes)
    assert((w1, h1) == ((w2, h2)) && f1.sameElements(f2))
  }

  test("frame sampling strides the payload") {
    assert(Multimodal.sampleFrameOffsets(10000, 4096) == Seq(0L, 4096L, 8192L))
  }

  test("q41 runs and is row-complete") {
    val df = SparkEntry.queries("q41_multimodal_features")(spark, SF)
    assert(df.count() == 500)
    assert(df.columns.toSeq ==
      Seq("asset_id", "kind", "n_bytes", "width", "height", "feat_l1"))
  }
}

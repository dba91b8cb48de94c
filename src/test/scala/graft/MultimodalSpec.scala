package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Asset, FakeCodec}

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def asset(id: Long, kind: String, payload: String, durMs: Long = 60000L) =
    Asset(id, kind, payload.getBytes("UTF-8"), 64, 48, 16000, durMs)

  test("imageFeatures computes deterministic byte stats partition-locally") {
    val ds = Seq(asset(1L, "image", "abcd"), asset(2L, "image", "")).toDS()
    val f = Multimodal.imageFeatures(ds).collect().map(x => x.asset_id -> x).toMap
    assert(f(1L).n_bytes === 4L)
    assert(f(1L).mean_byte === ('a' + 'b' + 'c' + 'd') / 4.0)
    assert(f(2L).n_bytes === 0L && f(2L).mean_byte === 0.0)
    // determinism: same payload → same checksum
    val again = Multimodal.imageFeatures(ds).collect().map(x => x.asset_id -> x.checksum).toMap
    assert(again(1L) === f(1L).checksum)
  }

  test("resize produces exactly w*h bytes and updates metadata") {
    val ds = Seq(asset(1L, "image", "hello world")).toDS()
    val r = Multimodal.resized(ds, 8, 4).head()
    assert(r.payload.length === 32 && r.width === 8 && r.height === 4)
  }

  test("frame sampling emits only video assets with bounded fan-out") {
    val ds = Seq(asset(1L, "video", "vid", durMs = 20000L),
      asset(2L, "image", "img")).toDS()
    val frames = Multimodal.sampleFrames(ds, everyMs = 5000L).collect()
    assert(frames.forall(_.asset_id == 1L))
    assert(frames.length === 4) // 20000/5000
    assert(frames.map(_.t_ms).sorted === Array(0L, 5000L, 10000L, 15000L))
  }

  test("binaryFile ingestion maps a real directory tree onto the Asset pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("medialake")
    val sub = java.nio.file.Files.createDirectory(dir.resolve("shard0"))
    java.nio.file.Files.write(dir.resolve("a.png"), "PNGBYTES".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("b.wav"), "WAVDATA".getBytes("UTF-8"))
    java.nio.file.Files.write(sub.resolve("c.mp4"), "MP4!".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("notes.txt"), "x".getBytes("UTF-8"))
    // camera-style uppercase extension must still route by kind
    java.nio.file.Files.write(dir.resolve("IMG_0042.JPG"), "JPGDATA".getBytes("UTF-8"))
    val assets = Multimodal.ingestBinaryDir(spark, dir.toString).collect()
    assert(assets.length === 5, "recursive lookup must find all files")
    val byKind = assets.groupBy(_.kind).view.mapValues(_.length).toMap
    assert(byKind === Map("image" -> 2, "audio" -> 1, "video" -> 1, "binary" -> 1))
    // payload bytes survive ingestion intact and feed the feature pipeline
    val imgs = assets.filter(_.kind == "image")
      .map(a => new String(a.payload, "UTF-8") -> a.duration_ms).toMap
    assert(imgs === Map("PNGBYTES" -> 8L, "JPGDATA" -> 7L),
      "payloads intact, binaryFile `length` carried through")
    val feats = Multimodal.imageFeatures(
      Multimodal.ingestBinaryDir(spark, dir.toString, glob = "*.png")).collect()
    assert(feats.length === 1 && feats.head.n_bytes === 8L)
    // deterministic ids under re-ingestion (path hash, not monotonic id)
    val again = Multimodal.ingestBinaryDir(spark, dir.toString).collect()
    assert(again.map(_.asset_id).sorted.sameElements(assets.map(_.asset_id).sorted))
  }

  test("assets table from documents has the real binary+metadata schema") {
    val ds = Multimodal.assets(spark, sf0001)
    val sch = ds.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(sch("payload") === "binary")
    assert(sch("kind") === "string" && sch("duration_ms") === "bigint")
    assert(ds.count() > 0)
  }
}

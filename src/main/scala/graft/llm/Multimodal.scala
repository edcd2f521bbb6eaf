package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, chunking/frame-sampling, and a decode seam.
  *
  * The Spark-side plumbing — schema (binary + metadata struct),
  * partition-friendly per-row expressions, chunk explosion — is real
  * and tested. The actual codec step is STUBBED: this container ships
  * no image/audio libraries, so [[fakeDecodeMeta]] derives
  * deterministic pseudo-metadata from the bytes. A production build
  * replaces exactly that one function with a real decoder (as a
  * mapPartitions/Arrow-batch stage so the codec amortizes per batch);
  * every downstream operator (chunking, metadata filters, sampling) is
  * unchanged.
  *
  * Scale posture: payloads stay opaque binary all the way through the
  * plan — no driver collection, no string round-trip; metadata extract
  * and chunk explosion are map-side only.
  */
object Multimodal {

  /** Stand-in payload: the document's UTF-8 bytes as the binary blob
    * (real pipelines read image/audio bytes from object storage). */
  def payload(text: Column): Column = text.cast("binary")

  /** === STUB: deterministic fake decode ===
    * Derives (format, width, height, n_bytes) pseudo-metadata from the
    * payload bytes. Replace with a real codec (e.g. javax.imageio /
    * ffmpeg via mapPartitions) in production — signature stays. */
  def fakeDecodeMeta(bin: Column): Column = {
    val h = abs(xxhash64(bin))
    struct(
      when(h % 3 === 0, "png").when(h % 3 === 1, "jpeg").otherwise("webp").as("format"),
      (h % 1920 + 64).cast("int").as("width"),
      (h % 1080 + 64).cast("int").as("height"),
      length(bin).as("n_bytes"))
  }

  /** Fixed-size byte chunks (frame sampling / patch extraction shape):
    * array of `chunkSize`-byte slices, last one ragged. */
  def chunks(bin: Column, chunkSize: Int): Column =
    transform(
      sequence(lit(0), ceil(length(bin).cast("double") / chunkSize).cast("int") - 1),
      i => bin.substr(i * chunkSize + 1, lit(chunkSize)))

  /** Every k-th chunk ("frame sample" stride). */
  def sampleEvery(chunksCol: Column, stride: Int): Column =
    filter(chunksCol, (_, i) => i % stride === 0)
}

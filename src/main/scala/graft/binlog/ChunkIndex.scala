package graft.binlog

import java.nio.charset.StandardCharsets

/** Per-chunk descriptor, isomorphic to the reference's
  * `ChunkDescriptor` (`/root/reference/common/src/main/java/com/spredfast/kafka/connect/s3/json/ChunkDescriptor.java:5-16`).
  */
final case class Chunk(
    firstRecordOffset: Long,
    numRecords: Long,
    byteOffset: Long,
    byteLength: Long,
    byteLengthUncompressed: Long)

/** Chunk index of one segment file, isomorphic to `ChunksIndex`
  * (`common/.../json/ChunksIndex.java:7-37`). Serialized as the same JSON
  * shape the reference emits (snake_case keys) so the golden-vector tests
  * carry over (FIXTURES.md F2).
  */
final case class ChunkIndex(chunks: Vector[Chunk]) {
  def totalSize: Long = chunks.map(_.byteLength).sum
  def totalRecords: Long = chunks.map(_.numRecords).sum
  /** Next offset after this file: `last.first_record_offset + num_records`
    * (≙ `S3Writer.fetchOffset` arithmetic, `sink/.../S3Writer.java:92-96`). */
  def nextOffset: Long =
    if (chunks.isEmpty) 0L else chunks.last.firstRecordOffset + chunks.last.numRecords
  /** Chunk containing `offset`, if any (≙ `ChunksIndex.chunkContaining`). */
  def chunkContaining(offset: Long): Option[Chunk] =
    chunks.find(c => c.firstRecordOffset <= offset && offset < c.firstRecordOffset + c.numRecords)

  def toJson: String = {
    val sb = new StringBuilder("{\"chunks\":[")
    var first = true
    chunks.foreach { c =>
      if (!first) sb.append(',')
      first = false
      sb.append(s"""{"first_record_offset":${c.firstRecordOffset},"num_records":${c.numRecords},"byte_offset":${c.byteOffset},"byte_length":${c.byteLength},"byte_length_uncompressed":${c.byteLengthUncompressed}}""")
    }
    sb.append("]}")
    sb.toString
  }
}

object ChunkIndex {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def fromJson(json: String): ChunkIndex = {
    val root = mapper.readTree(json)
    val arr = root.get("chunks")
    val chunks = Vector.newBuilder[Chunk]
    val it = arr.elements()
    while (it.hasNext) {
      val n = it.next()
      chunks += Chunk(
        n.get("first_record_offset").asLong(),
        n.get("num_records").asLong(),
        n.get("byte_offset").asLong(),
        n.get("byte_length").asLong(),
        n.get("byte_length_uncompressed").asLong())
    }
    ChunkIndex(chunks.result())
  }

  def fromBytes(b: Array[Byte]): ChunkIndex = fromJson(new String(b, StandardCharsets.UTF_8))
}

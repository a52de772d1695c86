package graft.sources

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path}
import java.nio.{ByteBuffer, ByteOrder}

/** Impala's fail-fast Parquet footer validation
  * (`be/src/exec/parquet/parquet-metadata-utils.cc` ValidateFileVersion
  * + ValidateColumnOffsets and the scanner's footer bounds checks):
  * magic bytes, the metadata length against the file size, and every
  * column chunk's dictionary/data offsets against the file size —
  * each with the reference's client-visible message. At 100 TB this is
  * the difference between one driver-side footer read rejecting a
  * corrupt file and a thousand-executor scan failing mid-query.
  */
object ParquetFooterCheck {

  /** None = footer passes; Some(msg) = Impala's scanner error. */
  def validate(path: Path, displayPath: String): Option[String] = {
    val size = Files.size(path)
    if (size < 12)
      return Some(s"File '$displayPath' is invalid. Invalid file size: $size")
    val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    val ch = FileChannel.open(path)
    try {
      var pos = size - 8
      while (tail.hasRemaining) {
        val n = ch.read(tail, pos)
        if (n < 0)
          return Some(s"File '$displayPath' is invalid. Invalid file size: $size")
        pos += n
      }
    } finally ch.close()
    tail.flip()
    val metaLen = tail.getInt(0)
    val magic = Array(tail.get(4), tail.get(5), tail.get(6), tail.get(7))
    if (!java.util.Arrays.equals(magic, "PAR1".getBytes("US-ASCII")))
      return Some(s"File '$displayPath' has an invalid Parquet version " +
        s"number: ${magic.map(b => f"${b & 0xff}%02x").mkString(" ")}")
    if (metaLen <= 0 || metaLen.toLong + 8 > size)
      return Some("Invalid metadata size in file footer")
    // footer parses — validate every column chunk's physical offsets.
    // A metaLen that passes the size bound can still point parquet-mr
    // at garbage; a thrift-deserialize failure IS a corrupt footer, so
    // map it to the scanner's message instead of letting it escape.
    val conf = new org.apache.hadoop.conf.Configuration()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path.toUri), conf)
    val r =
      try org.apache.parquet.hadoop.ParquetFileReader.open(in)
      catch {
        case _: Exception =>
          return Some("Invalid metadata size in file footer")
      }
    try {
      val blocks = r.getFooter.getBlocks
      var b = 0
      while (b < blocks.size()) {
        val cols = blocks.get(b).getColumns
        var i = 0
        while (i < cols.size()) {
          val c = cols.get(i)
          val dataOff = c.getFirstDataPageOffset
          if (dataOff >= size)
            return Some(s"Column $i has invalid data page offset " +
              s"(offset=$dataOff file_size=$size)")
          val dictOff = c.getDictionaryPageOffset
          if (dictOff > 0 && dictOff >= size)
            return Some(s"Column $i has invalid dictionary page offset " +
              s"(offset=$dictOff file_size=$size)")
          val start = c.getStartingPos
          val tot = c.getTotalSize
          if (start < 0 || tot < 0 || start + tot > size)
            return Some(s"Column $i has invalid column offsets " +
              s"(offset=$start, size=$tot, file_size=$size)")
          i += 1
        }
        b += 1
      }
      None
    } finally r.close()
  }

  /** Column names whose Parquet OFFSET INDEX fails Impala's page-index
    * validation (`parquet-page-index.cc` — entries must be positive,
    * strictly increasing, inside the file, with increasing first-row
    * indexes). A corrupt index poisons only ITS column: scans that
    * touch it raise, other columns read clean.
    */
  def invalidOffsetIndexColumns(path: Path): Set[String] = {
    val size = Files.size(path)
    val conf = new org.apache.hadoop.conf.Configuration()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path.toUri), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks
      (0 until blocks.size()).flatMap { b =>
        val cols = blocks.get(b).getColumns
        (0 until cols.size()).flatMap { i =>
          val c = cols.get(i)
          val bad =
            try {
              val oi = r.readOffsetIndex(c)
              oi != null && {
                var prevOff = 0L
                var prevRow = -1L
                (0 until oi.getPageCount).exists { k =>
                  val off = oi.getOffset(k)
                  val row = oi.getFirstRowIndex(k)
                  val broken = off <= prevOff || off >= size ||
                    row <= prevRow
                  prevOff = off; prevRow = row
                  broken
                }
              }
            } catch { case _: Exception => true }
          if (bad) Some(c.getPath.toDotString) else None
        }
      }.toSet
    } finally r.close()
  }

  /** True when any column chunk carries the deprecated BIT_PACKED
    * rep/def-level encoding the reference's scanner refuses to
    * materialize (IMPALA-6077).
    */
  def hasBitPackedLevels(path: Path): Boolean = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path.toUri), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks
      (0 until blocks.size()).exists { b =>
        val cols = blocks.get(b).getColumns
        (0 until cols.size()).exists { i =>
          // The footer's encodings set conflates data-page and level
          // encodings: old writers list BIT_PACKED for the trivial
          // repetition levels of flat columns whose definition levels
          // are RLE (those files read fine in the reference). Only a
          // chunk with BIT_PACKED and NO RLE has bit-packed def levels
          // (the IMPALA-6077 case the reference scanner rejects).
          val encs = cols.get(i).getEncodings
          encs.contains(org.apache.parquet.column.Encoding.BIT_PACKED) &&
            !encs.contains(org.apache.parquet.column.Encoding.RLE)
        }
      }
    } finally r.close()
  }
}

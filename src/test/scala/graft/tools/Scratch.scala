package graft.tools

object Scratch {
  def main(args: Array[String]): Unit = {
    for (fileProleptic <- Seq(false, true); outProleptic <- Seq(false, true)) {
      for (rel <- Seq("out_of_range_date.orc", "hive2_pre_gregorian.orc")) {
        val conf = new org.apache.hadoop.conf.Configuration()
        conf.set("orc.proleptic.gregorian.default", fileProleptic.toString)
        val r = org.apache.orc.OrcFile.createReader(
          new org.apache.hadoop.fs.Path(s"/root/reference/testdata/data/$rel"),
          org.apache.orc.OrcFile.readerOptions(conf)
            .convertToProlepticGregorian(outProleptic))
        val rows = r.rows()
        val days = scala.collection.mutable.ArrayBuffer.empty[Long]
        val batch = r.getSchema.createRowBatch()
        while (rows.nextBatch(batch)) {
          val col = batch.cols(0).asInstanceOf[
            org.apache.hadoop.hive.ql.exec.vector.LongColumnVector]
          (0 until batch.size).foreach(i => days += col.vector(if (col.isRepeating) 0 else i))
        }
        rows.close()
        println(s"file=$fileProleptic out=$outProleptic $rel -> ${days.mkString(",")}")
      }
    }
    println("expect hive2 first = " + java.time.LocalDate.of(1582, 10, 14).toEpochDay)
  }
}

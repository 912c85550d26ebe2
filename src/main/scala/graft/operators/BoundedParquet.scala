package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.MessageType

/** Driver-side parquet IO for BOUNDED model files — the PQ codebook
  * (`meta*`, O(codebook entries)) and the coarse quantizer
  * (`centroids`, O(nlist)).
  *
  * These files are O(model), not O(data): reading one through a full
  * `spark.read.parquet(...).collect()` pays DataSource resolution, a
  * driver-side footer/schema inference pass AND a scheduled Spark job —
  * ~100 ms of fixed overhead per read for a few kilobytes — and the index
  * operators read them on every append / search / describe (measured: the
  * ann_index bench family spent 0.8–1.6 s per query in exactly this
  * driver gap + tiny-job overhead). Reading the footers directly on the
  * driver (the [[IndexCommit.footerRowCount]] pattern, extended to row
  * CONTENT via parquet's example Group API) makes each read a couple of
  * bounded ranged reads with zero jobs; at 100 TB the model files stay
  * O(model), so the driver read stays O(1) while the job-based read would
  * still pay per-action scheduling on every micro-batch.
  *
  * The format on disk stays ORDINARY PARQUET: files written by the Spark
  * writer in earlier rounds read back unchanged (the reader consumes any
  * standard-layout parquet), and files written here are standard-layout
  * parquet any engine can read.
  */
private[graft] object BoundedParquet {

  /** every row of every `*.parquet` file under `dir` (or of the single
    * file `dir` itself) as example Groups — no Spark job. Throws
    * FileNotFoundException when the path is absent (callers translate —
    * a missing model file has caller-specific meaning). */
  def readGroups(fs: FileSystem, conf: Configuration,
                 dir: String): Seq[Group] = {
    val p = new Path(dir)
    val st = fs.getFileStatus(p) // throws FileNotFoundException if absent
    val files =
      if (st.isFile) Seq(st)
      else fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getPath.getName)
    val out = ArrayBuffer.empty[Group]
    files.foreach { f =>
      val rdr = ParquetFileReader.open(HadoopInputFile.fromStatus(f, conf))
      try {
        val schema = rdr.getFooter.getFileMetaData.getSchema
        var pages = rdr.readNextRowGroup()
        while (pages != null) {
          val io = new ColumnIOFactory().getColumnIO(schema)
          val rr = io.getRecordReader(pages, new GroupRecordConverter(schema))
          var i = 0L
          while (i < pages.getRowCount) { out += rr.read(); i += 1 }
          pages = rdr.readNextRowGroup()
        }
      } finally rdr.close()
    }
    out.toSeq
  }

  /** a group's FLOAT-list field as an array (the standard 3-level parquet
    * list layout Spark writes: field (LIST) > repeated list > element;
    * legacy 2-level names `array`/`bag` from writeLegacyFormat readers
    * are handled for completeness) */
  def floatList(g: Group, field: String): Array[Float] = {
    val list = g.getGroup(field, 0)
    val t = list.getType
    val repeated = t.getFieldName(0) // "list" (standard) or "array"/"bag"
    val n = list.getFieldRepetitionCount(repeated)
    val out = new Array[Float](n)
    val inner = t.getType(0)
    var i = 0
    if (inner.isPrimitive) { // legacy 2-level: repeated float array
      while (i < n) { out(i) = list.getFloat(repeated, i); i += 1 }
    } else {
      val elem = inner.asGroupType.getFieldName(0) // "element"
      while (i < n) {
        out(i) = list.getGroup(repeated, i).getFloat(elem, 0); i += 1
      }
    }
    out
  }

  /** Overwrite `dir` with ONE parquet file whose rows are produced by
    * `build` (called once with a group factory and a row sink; bounded
    * model rows — the writer runs on the driver, no Spark job). Same
    * commit shape as the Spark writer it replaces: rows land complete in
    * a unique temp dir, then delete-target + rename swaps it in, so a
    * crash mid-write never leaves a half-written live file. */
  def overwrite(fs: FileSystem, schema: MessageType, dir: String)
               (build: (org.apache.parquet.example.data.simple.SimpleGroupFactory,
                        Group => Unit) => Unit): Unit = {
    val tmp = new Path(dir + "_w" + IndexCommit.nonce())
    val file = new Path(tmp, "part-00000.parquet")
    val w = ExampleParquetWriter.builder(
        HadoopOutputFile.fromPath(file, fs.getConf))
      .withType(schema)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    try {
      val factory =
        new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
      build(factory, w.write(_))
    } finally w.close()
    val target = new Path(dir)
    fs.delete(target, true)
    if (!fs.rename(tmp, target))
      throw new IllegalStateException(
        s"bounded parquet write: rename $tmp -> $target failed")
    ()
  }
}

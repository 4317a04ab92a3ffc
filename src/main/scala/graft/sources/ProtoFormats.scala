package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Protobuf ingestion for the two highest-volume real ingestion paths:
  * Prometheus remote-write (lib/protoparser/promremotewrite;
  * prompb layout lib/prompb/write_request_unmarshaler.go:86-165) and
  * OTLP metrics (lib/protoparser/opentelemetry/pb/pb.go).
  *
  * The wire codec is hand-rolled (zero-dependency): protobuf's wire format
  * is varint tags + varint/fixed64/length-delimited payloads, which is all
  * these two schemas need. Parsing runs as a map stage over binary payload
  * rows — each executor decodes its payloads straight into canonical
  * (name, tags, ts, value) sample rows, so ingestion scales with
  * partitions, exactly like the text formats in [[LineFormats]].
  *
  * Remote-write bodies are snappy-compressed like the reference's
  * (`org.xerial.snappy` ships with Spark).
  */
object ProtoFormats {

  // ------------------------------------------------------------------
  // minimal wire-format reader/writer
  // ------------------------------------------------------------------

  final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      var b = 0
      do {
        b = buf(pos) & 0xff
        pos += 1
        result |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }
    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }
    def readFixed64(): Long = {
      var r = 0L
      var i = 0
      while (i < 8) { r |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      r
    }
    def readDouble(): Double = java.lang.Double.longBitsToDouble(readFixed64())
    /** packed repeated varints (wire type 2); caller zigzag-decodes */
    def readPackedVarints(): Seq[Long] = {
      val sub = readMessage()
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (sub.hasNext) out += sub.readVarint()
      out.toSeq
    }
    /** packed repeated fixed64 (wire type 2) */
    def readPackedFixed64s(): Seq[Long] = {
      val sub = readMessage()
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (sub.hasNext) out += sub.readFixed64()
      out.toSeq
    }
    /** packed repeated doubles (wire type 2) */
    def readPackedDoubles(): Seq[Double] = {
      val sub = readMessage()
      val out = scala.collection.mutable.ArrayBuffer.empty[Double]
      while (sub.hasNext) out += sub.readDouble()
      out.toSeq
    }
    /** length-delimited field → sub-reader */
    def readMessage(): Reader = {
      val len = readVarint().toInt
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }
    def readString(): String = {
      val len = readVarint().toInt
      val s = new String(buf, pos, len, java.nio.charset.StandardCharsets.UTF_8)
      pos += len
      s
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 => pos += readVarint().toInt
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"unsupported wire type $other")
    }
  }

  final class Writer {
    private val out = new java.io.ByteArrayOutputStream(256)
    def bytes: Array[Byte] = out.toByteArray
    def varint(v: Long): Writer = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
      this
    }
    def tag(field: Int, wireType: Int): Writer = varint((field.toLong << 3) | wireType)
    def int64(field: Int, v: Long): Writer = { tag(field, 0); varint(v) }
    def double(field: Int, v: Double): Writer = {
      tag(field, 1)
      var bits = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; i += 1 }
      this
    }
    def fixed64(field: Int, v: Long): Writer = {
      tag(field, 1)
      var bits = v
      var i = 0
      while (i < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; i += 1 }
      this
    }
    def string(field: Int, s: String): Writer = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      tag(field, 2); varint(b.length); out.write(b, 0, b.length)
      this
    }
    def message(field: Int, m: Writer): Writer = {
      val b = m.bytes
      tag(field, 2); varint(b.length); out.write(b, 0, b.length)
      this
    }
    def packedFixed64s(field: Int, vs: Seq[Long]): Writer = {
      tag(field, 2); varint(vs.length * 8L)
      vs.foreach { v0 =>
        var bits = v0
        var i = 0
        while (i < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; i += 1 }
      }
      this
    }
    def packedDoubles(field: Int, vs: Seq[Double]): Writer =
      packedFixed64s(field, vs.map(java.lang.Double.doubleToLongBits))
  }

  /** canonical decoded sample (the typed twin of the samples schema) */
  final case class Sample(
      name: String, tags: Map[String, String], ts: Long, value: Double)

  /** Map-side payload decode as a TYPED flatMap — works on batch AND
    * Structured Streaming frames (an RDD hop would reject streaming
    * sources), which is what lets the landing-zone pipeline
    * ([[graft.streaming.Ingest.binaryToStore]]) reuse these parsers
    * unchanged for exactly-once protobuf ingest.
    */
  private def toSamplesDf(payloads: DataFrame,
      decode: Array[Byte] => Iterator[Row]): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("payload")).as[Array[Byte]]
      .flatMap(b => decode(b).map(r => Sample(
        r.getString(0), r.getAs[Map[String, String]](1), r.getLong(2), r.getDouble(3))))
      .toDF()
  }

  // ------------------------------------------------------------------
  // Prometheus remote-write (prompb.WriteRequest)
  // ------------------------------------------------------------------

  /** decode one snappy-compressed WriteRequest body into sample rows */
  def decodeWriteRequest(compressed: Array[Byte]): Iterator[Row] = {
    val raw = org.xerial.snappy.Snappy.uncompress(compressed)
    val req = new Reader(raw, 0, raw.length)
    val rows = mutable.ArrayBuffer.empty[Row]
    while (req.hasNext) {
      val (field, wt) = req.readTag()
      if (field == 1 && wt == 2) { // TimeSeries
        val ts = req.readMessage()
        var name: String = null
        val tags = mutable.LinkedHashMap.empty[String, String]
        val samples = mutable.ArrayBuffer.empty[(Long, Double)]
        val histograms = mutable.ArrayBuffer.empty[Reader]
        while (ts.hasNext) {
          val (f2, w2) = ts.readTag()
          if (f2 == 1 && w2 == 2) { // Label{name=1, value=2}
            val lb = ts.readMessage()
            var ln: String = null
            var lv: String = null
            while (lb.hasNext) {
              val (f3, w3) = lb.readTag()
              if (f3 == 1 && w3 == 2) ln = lb.readString()
              else if (f3 == 2 && w3 == 2) lv = lb.readString()
              else lb.skip(w3)
            }
            if (ln == "__name__") name = lv
            else if (ln != null && lv != null) tags(ln) = lv
          } else if (f2 == 2 && w2 == 2) { // Sample{value=1 double, timestamp=2}
            val sm = ts.readMessage()
            var v = 0.0
            var t = 0L
            while (sm.hasNext) {
              val (f3, w3) = sm.readTag()
              if (f3 == 1 && w3 == 1) v = sm.readDouble()
              else if (f3 == 2 && w3 == 0) t = sm.readVarint()
              else sm.skip(w3)
            }
            samples += ((t, v))
          } else if (f2 == 4 && w2 == 2) { // native Histogram
            histograms += ts.readMessage()
          } else ts.skip(w2)
        }
        val tagMap = tags.toMap
        samples.foreach { case (t, v) => rows += Row(name, tagMap, t, v) }
        // native histograms need a metric name to suffix (the reference
        // skips nameless ones, write_request_unmarshaler.go:399)
        if (name != null) histograms.foreach { h =>
          decodeNativeHistogram(h, name, tagMap,
            (n, tg, t, v) => { rows += Row(n, tg, t, v); () })
        }
      } else req.skip(wt)
    }
    rows.iterator
  }

  /** prompb native Histogram (types.proto L57, the reference's
    * write_request_unmarshaler.go:213 unmarshalHistogram +
    * appendTimeSeries:381) → `_count`/`_sum` + per-non-zero-bucket
    * `_bucket{vmrange="lo...hi"}` rows with base-2^(2^-schema) bounds —
    * sparse span/delta encoding (integer histograms carry cumulative
    * DELTAS, float histograms absolute counts), zero bucket at
    * [-zero_threshold...zero_threshold]. Same VM-native model as the
    * OTLP exponential-histogram conversion.
    */
  private def decodeNativeHistogram(
      h: Reader, name: String, tags: Map[String, String],
      emit: (String, Map[String, String], Long, Double) => Unit): Unit = {
    final case class Span(offset: Int, length: Int)
    def readSpan(b: Reader): Span = {
      var off = 0
      var len = 0
      while (b.hasNext) {
        val (f, w) = b.readTag()
        (f, w) match {
          case (1, 0) =>
            val z = b.readVarint()
            off = ((z >>> 1) ^ -(z & 1)).toInt
          case (2, 0) => len = b.readVarint().toInt
          case _ => b.skip(w)
        }
      }
      Span(off, len)
    }
    def zig64(z: Long): Long = (z >>> 1) ^ -(z & 1)
    var count = 0.0
    var sum = 0.0
    var schema = 0
    var zeroThreshold = 0.0
    var zeroCount = 0.0
    var tsMs = 0L
    val posSpans = mutable.ArrayBuffer.empty[Span]
    val negSpans = mutable.ArrayBuffer.empty[Span]
    val posDeltas = mutable.ArrayBuffer.empty[Long]
    val negDeltas = mutable.ArrayBuffer.empty[Long]
    val posCounts = mutable.ArrayBuffer.empty[Double]
    val negCounts = mutable.ArrayBuffer.empty[Double]
    while (h.hasNext) {
      val (f, w) = h.readTag()
      (f, w) match {
        case (1, 0) => count = h.readVarint().toDouble
        case (2, 1) => count = h.readDouble()
        case (3, 1) => sum = h.readDouble()
        case (4, 0) => schema = zig64(h.readVarint()).toInt
        case (5, 1) => zeroThreshold = h.readDouble()
        case (6, 0) => zeroCount = h.readVarint().toDouble
        case (7, 1) => zeroCount = h.readDouble()
        case (8, 2) => negSpans += readSpan(h.readMessage())
        case (9, 2) => negDeltas ++= h.readPackedVarints().map(zig64)
        case (9, 0) => negDeltas += zig64(h.readVarint())
        case (10, 2) => negCounts ++= h.readPackedDoubles()
        case (10, 1) => negCounts += h.readDouble()
        case (11, 2) => posSpans += readSpan(h.readMessage())
        case (12, 2) => posDeltas ++= h.readPackedVarints().map(zig64)
        case (12, 0) => posDeltas += zig64(h.readVarint())
        case (13, 2) => posCounts ++= h.readPackedDoubles()
        case (13, 1) => posCounts += h.readDouble()
        case (15, 0) => tsMs = h.readVarint()
        case _ => h.skip(w)
      }
    }
    emit(name + "_count", tags, tsMs, count)
    emit(name + "_sum", tags, tsMs, sum)
    if (zeroCount > 0)
      emit(name + "_bucket",
        tags + ("vmrange" -> fmtVmrange(-zeroThreshold, zeroThreshold)),
        tsMs, zeroCount)
    val base = math.pow(2, math.pow(2, -schema.toDouble))
    def spanBuckets(spans: Seq[Span], deltas: Seq[Long], counts: Seq[Double],
        negative: Boolean): Unit = {
      val useFloat = counts.nonEmpty
      var bucketIdx = 0
      var i = 0
      var cum = 0L
      spans.foreach { span =>
        bucketIdx += span.offset
        var j = 0
        while (j < span.length && i < (if (useFloat) counts.size else deltas.size)) {
          val c =
            if (useFloat) counts(i)
            else { cum += deltas(i); cum.toDouble }
          i += 1
          if (c > 0) {
            val upper = math.pow(base, bucketIdx.toDouble)
            val lower = upper / base
            val vr = if (negative) fmtVmrange(-upper, -lower)
              else fmtVmrange(lower, upper)
            emit(name + "_bucket", tags + ("vmrange" -> vr), tsMs, c)
          }
          bucketIdx += 1
          j += 1
        }
      }
    }
    spanBuckets(posSpans.toSeq, posDeltas.toSeq, posCounts.toSeq, negative = false)
    spanBuckets(negSpans.toSeq, negDeltas.toSeq, negCounts.toSeq, negative = true)
  }

  /** parse stage: binary `payload` rows → canonical samples frame */
  def remoteWrite(payloads: DataFrame): DataFrame =
    toSamplesDf(payloads, decodeWriteRequest)

  /** export: samples → one snappy WriteRequest payload per partition
    * (one TimeSeries per series, like real remote-write batches)
    */
  def exportRemoteWrite(samples: DataFrame): DataFrame = {
    val spark = samples.sparkSession
    val rdd = samples.select(col("name"), col("tags"), col("ts"), col("value"))
      .rdd.mapPartitions { it =>
        val bySeries = mutable.LinkedHashMap
          .empty[(String, Seq[(String, String)]), mutable.ArrayBuffer[(Long, Double)]]
        it.foreach { r =>
          val name = r.getString(0)
          val tags = Option(r.getMap[String, String](1))
            .map(_.toSeq.sortBy(_._1)).getOrElse(Nil)
          bySeries.getOrElseUpdate((name, tags), mutable.ArrayBuffer.empty) +=
            ((r.getLong(2), r.getDouble(3)))
        }
        if (bySeries.isEmpty) Iterator.empty
        else {
          val req = new Writer
          bySeries.foreach { case ((name, tags), samples) =>
            val ts = new Writer
            if (name != null)
              ts.message(1, new Writer().string(1, "__name__").string(2, name))
            tags.foreach { case (k, v) =>
              ts.message(1, new Writer().string(1, k).string(2, v))
            }
            samples.foreach { case (t, v) =>
              ts.message(2, new Writer().double(1, v).int64(2, t))
            }
            req.message(1, ts)
          }
          Iterator.single(Row(org.xerial.snappy.Snappy.compress(req.bytes)))
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(StructField("payload", BinaryType))))
  }

  // ------------------------------------------------------------------
  // OTLP metrics (ExportMetricsServiceRequest)
  // ------------------------------------------------------------------

  /** KeyValue{key=1, value=2 AnyValue{string=1|bool=2|int=3|double=4}} */
  private def decodeKeyValue(kv: Reader): Option[(String, String)] = {
    var key: String = null
    var value: String = null
    while (kv.hasNext) {
      val (f, w) = kv.readTag()
      if (f == 1 && w == 2) key = kv.readString()
      else if (f == 2 && w == 2) {
        val av = kv.readMessage()
        while (av.hasNext) {
          val (f2, w2) = av.readTag()
          (f2, w2) match {
            case (1, 2) => value = av.readString()
            case (2, 0) => value = (av.readVarint() != 0).toString
            case (3, 0) => value = av.readVarint().toString
            case (4, 1) => value = av.readDouble().toString
            case _ => av.skip(w2)
          }
        }
      } else kv.skip(w)
    }
    if (key != null && value != null) Some(key -> value) else None
  }

  /** NumberDataPoint{attributes=7, time_unix_nano=3 fixed64,
    * as_double=4 double, as_int=6 sfixed64, flags=8}; flags bit 1 is
    * NO_RECORDED_VALUE → staleness-marker NaN (streamparser.go:154)
    */
  private def decodeDataPoint(dp: Reader): (Map[String, String], Long, Double) = {
    val attrs = mutable.LinkedHashMap.empty[String, String]
    var tsNano = 0L
    var value = 0.0
    var flags = 0L
    while (dp.hasNext) {
      val (f, w) = dp.readTag()
      (f, w) match {
        case (7, 2) => decodeKeyValue(dp.readMessage()).foreach(kv => attrs(kv._1) = kv._2)
        case (3, 1) => tsNano = dp.readFixed64()
        case (4, 1) => value = dp.readDouble()
        case (6, 1) => value = dp.readFixed64().toDouble
        case (8, 0) => flags = dp.readVarint()
        case _ => dp.skip(w)
      }
    }
    (attrs.toMap, tsNano / 1000000L,
      if ((flags & 1) != 0) Double.NaN else value)
  }

  /** Go %g label formatting for le/quantile values (the reference's
    * fb.formatFloat; pb.go:1239 + summary pushSamples)
    */
  private def goLabel(d: Double): String =
    if (d.isPosInfinity) "+Inf" else graft.graphite.GraphiteModel.goFmt(d)

  /** HistogramDataPoint (pb.go:1097, metrics.proto L434) → the
    * Prometheus-compat series the reference pushes (pb.go pushSamples):
    * `<name>_count`, `<name>_sum` (only when present — sumless
    * histograms omit it), and CUMULATIVE `<name>_bucket{le=...}` rows
    * ending at `+Inf`. Data points with no buckets are skipped; a
    * bucket/bound length mismatch skips the point like the reference's
    * throttled warn.
    */
  private def decodeHistogramDataPoint(
      dp: Reader, name: String,
      emit: (String, Map[String, String], Long, Double) => Unit): Unit = {
    val attrs = mutable.LinkedHashMap.empty[String, String]
    var tsNano = 0L
    var count = 0L
    var sum = 0.0
    var hasSum = false
    var flags = 0L
    val bucketCounts = mutable.ArrayBuffer.empty[Long]
    val bounds = mutable.ArrayBuffer.empty[Double]
    while (dp.hasNext) {
      val (f, w) = dp.readTag()
      (f, w) match {
        case (9, 2) => decodeKeyValue(dp.readMessage()).foreach(kv => attrs(kv._1) = kv._2)
        case (3, 1) => tsNano = dp.readFixed64()
        case (4, 1) => count = dp.readFixed64()
        case (5, 1) => sum = dp.readDouble(); hasSum = true
        case (6, 2) => bucketCounts ++= dp.readPackedFixed64s()
        case (6, 1) => bucketCounts += dp.readFixed64() // unpacked form
        case (7, 2) => bounds ++= dp.readPackedDoubles()
        case (7, 1) => bounds += dp.readDouble()
        case (10, 0) => flags = dp.readVarint()
        case _ => dp.skip(w)
      }
    }
    if (bucketCounts.isEmpty || bucketCounts.size != bounds.size + 1) return
    val tags = attrs.toMap
    val tsMs = tsNano / 1000000L
    val stale = (flags & 1) != 0
    def v(x: Double) = if (stale) Double.NaN else x
    emit(name + "_count", tags, tsMs, v(count.toDouble))
    if (hasSum) emit(name + "_sum", tags, tsMs, v(sum))
    var cumulative = 0L
    bounds.zipWithIndex.foreach { case (bound, i) =>
      cumulative += bucketCounts(i)
      emit(name + "_bucket", tags + ("le" -> goLabel(bound)), tsMs,
        v(cumulative.toDouble))
    }
    cumulative += bucketCounts.last
    emit(name + "_bucket", tags + ("le" -> "+Inf"), tsMs, v(cumulative.toDouble))
  }

  /** Go `strconv.AppendFloat(v, 'e', 3, 64)` — the vmrange bound format
    * (pb/fmt_buffer.go:58 formatVmrange)
    */
  private def fmtVmrange(lo: Double, hi: Double): String =
    String.format(java.util.Locale.ROOT, "%.3e...%.3e",
      Double.box(lo), Double.box(hi))

  /** ExponentialHistogramDataPoint (pb.go exponential pushSamples,
    * metrics.proto L521) → VictoriaMetrics-NATIVE histogram series:
    * `<name>_count`, `<name>_sum` (optional), and one NON-cumulative
    * `<name>_bucket{vmrange="lo...hi"}` row per non-zero bucket —
    * base-2^(2^-scale) bounds, the zero bucket at
    * [-zero_threshold...zero_threshold]. These integrate with the query
    * layer's `prometheus_buckets()` vmrange→le conversion.
    */
  private def decodeExpHistogramDataPoint(
      dp: Reader, name: String,
      emit: (String, Map[String, String], Long, Double) => Unit): Unit = {
    val attrs = mutable.LinkedHashMap.empty[String, String]
    var tsNano = 0L
    var count = 0L
    var sum = 0.0
    var hasSum = false
    var scale = 0
    var zeroCount = 0L
    var zeroThreshold = 0.0
    var flags = 0L
    // Buckets{offset=1 sint32, bucket_counts=2 repeated uint64}
    def readBuckets(b: Reader): (Int, Seq[Long]) = {
      var offset = 0
      val counts = mutable.ArrayBuffer.empty[Long]
      while (b.hasNext) {
        val (f2, w2) = b.readTag()
        (f2, w2) match {
          case (1, 0) =>
            val z = b.readVarint()
            offset = ((z >>> 1) ^ -(z & 1)).toInt
          case (2, 0) => counts += b.readVarint()
          case (2, 2) => counts ++= b.readPackedVarints()
          case _ => b.skip(w2)
        }
      }
      (offset, counts.toSeq)
    }
    var positive: (Int, Seq[Long]) = (0, Nil)
    var negative: (Int, Seq[Long]) = (0, Nil)
    while (dp.hasNext) {
      val (f, w) = dp.readTag()
      (f, w) match {
        case (1, 2) => decodeKeyValue(dp.readMessage()).foreach(kv => attrs(kv._1) = kv._2)
        case (3, 1) => tsNano = dp.readFixed64()
        case (4, 1) => count = dp.readFixed64()
        case (5, 1) => sum = dp.readDouble(); hasSum = true
        case (6, 0) =>
          val z = dp.readVarint()
          scale = ((z >>> 1) ^ -(z & 1)).toInt
        case (7, 1) => zeroCount = dp.readFixed64()
        case (8, 2) => positive = readBuckets(dp.readMessage())
        case (9, 2) => negative = readBuckets(dp.readMessage())
        case (10, 0) => flags = dp.readVarint()
        case (14, 1) => zeroThreshold = dp.readDouble()
        case _ => dp.skip(w)
      }
    }
    val tags = attrs.toMap
    val tsMs = tsNano / 1000000L
    val stale = (flags & 1) != 0
    def v(x: Double) = if (stale) Double.NaN else x
    emit(name + "_count", tags, tsMs, v(count.toDouble))
    if (hasSum) emit(name + "_sum", tags, tsMs, v(sum))
    if (zeroCount > 0)
      emit(name + "_bucket",
        tags + ("vmrange" -> fmtVmrange(-zeroThreshold, zeroThreshold)),
        tsMs, v(zeroCount.toDouble))
    val ratio = math.pow(2, -scale.toDouble)
    val base = math.pow(2, ratio)
    def emitBuckets(offsetCounts: (Int, Seq[Long]), neg: Boolean): Unit = {
      val bound0 = math.pow(2, offsetCounts._1 * ratio)
      offsetCounts._2.zipWithIndex.foreach { case (c, i) =>
        if (c > 0) {
          val lower = bound0 * math.pow(base, i.toDouble)
          val upper = lower * base
          val vr = if (neg) fmtVmrange(-upper, -lower) else fmtVmrange(lower, upper)
          emit(name + "_bucket", tags + ("vmrange" -> vr), tsMs, v(c.toDouble))
        }
      }
    }
    emitBuckets(positive, neg = false)
    emitBuckets(negative, neg = true)
  }

  /** SummaryDataPoint (pb.go:1591, metrics.proto L636) → `<name>_count`,
    * `<name>_sum`, and one `<name>{quantile=...}` row per
    * ValueAtQuantile{quantile=1, value=2}
    */
  private def decodeSummaryDataPoint(
      dp: Reader, name: String,
      emit: (String, Map[String, String], Long, Double) => Unit): Unit = {
    val attrs = mutable.LinkedHashMap.empty[String, String]
    var tsNano = 0L
    var count = 0L
    var sum = 0.0
    var flags = 0L
    val quantiles = mutable.ArrayBuffer.empty[(Double, Double)]
    while (dp.hasNext) {
      val (f, w) = dp.readTag()
      (f, w) match {
        case (7, 2) => decodeKeyValue(dp.readMessage()).foreach(kv => attrs(kv._1) = kv._2)
        case (3, 1) => tsNano = dp.readFixed64()
        case (4, 1) => count = dp.readFixed64()
        case (5, 1) => sum = dp.readDouble()
        case (6, 2) =>
          val qv = dp.readMessage()
          var q = 0.0
          var v = 0.0
          while (qv.hasNext) {
            val (f2, w2) = qv.readTag()
            (f2, w2) match {
              case (1, 1) => q = qv.readDouble()
              case (2, 1) => v = qv.readDouble()
              case _ => qv.skip(w2)
            }
          }
          quantiles += ((q, v))
        case (8, 0) => flags = dp.readVarint()
        case _ => dp.skip(w)
      }
    }
    val tags = attrs.toMap
    val tsMs = tsNano / 1000000L
    val stale = (flags & 1) != 0
    def v(x: Double) = if (stale) Double.NaN else x
    emit(name + "_count", tags, tsMs, v(count.toDouble))
    emit(name + "_sum", tags, tsMs, v(sum))
    quantiles.foreach { case (q, x) =>
      emit(name, tags + ("quantile" -> goLabel(q)), tsMs, v(x))
    }
  }

  /** decode one ExportMetricsServiceRequest: gauge (5) and sum (7) data
    * points become samples; resource attributes (Resource.attributes=1)
    * merge into every sample's tags (pb.go decodeResourceMetrics).
    */
  def decodeOtlp(raw: Array[Byte]): Iterator[Row] = {
    val req = new Reader(raw, 0, raw.length)
    val rows = mutable.ArrayBuffer.empty[Row]
    while (req.hasNext) {
      val (f, w) = req.readTag()
      if (f == 1 && w == 2) { // ResourceMetrics
        val rm = req.readMessage()
        val resourceAttrs = mutable.LinkedHashMap.empty[String, String]
        // first pass saves positions: fields arrive in order (resource=1
        // precedes scope_metrics=2 in practice); collect both in one walk
        val scopeBufs = mutable.ArrayBuffer.empty[Reader]
        while (rm.hasNext) {
          val (f2, w2) = rm.readTag()
          if (f2 == 1 && w2 == 2) { // Resource{attributes=1}
            val res = rm.readMessage()
            while (res.hasNext) {
              val (f3, w3) = res.readTag()
              if (f3 == 1 && w3 == 2)
                decodeKeyValue(res.readMessage()).foreach(kv => resourceAttrs(kv._1) = kv._2)
              else res.skip(w3)
            }
          } else if (f2 == 2 && w2 == 2) scopeBufs += rm.readMessage()
          else rm.skip(w2)
        }
        scopeBufs.foreach { sm =>
          while (sm.hasNext) {
            val (f3, w3) = sm.readTag()
            if (f3 == 2 && w3 == 2) { // Metric
              val metric = sm.readMessage()
              var name: String = null
              val dataPoints = mutable.ArrayBuffer.empty[(Map[String, String], Long, Double)]
              // histogram (9) / summary (11) points expand into several
              // named series, so buffer their sub-readers until the name
              // is known (fields may arrive in any order)
              val histPoints = mutable.ArrayBuffer.empty[Reader]
              val expHistPoints = mutable.ArrayBuffer.empty[Reader]
              val summaryPoints = mutable.ArrayBuffer.empty[Reader]
              while (metric.hasNext) {
                val (f4, w4) = metric.readTag()
                if (f4 == 1 && w4 == 2) name = metric.readString()
                else if ((f4 == 5 || f4 == 7) && w4 == 2) { // Gauge | Sum
                  val g = metric.readMessage()
                  while (g.hasNext) {
                    val (f5, w5) = g.readTag()
                    if (f5 == 1 && w5 == 2) dataPoints += decodeDataPoint(g.readMessage())
                    else g.skip(w5)
                  }
                } else if ((f4 == 9 || f4 == 10 || f4 == 11) && w4 == 2) {
                  // Histogram | ExponentialHistogram | Summary
                  val h = metric.readMessage()
                  while (h.hasNext) {
                    val (f5, w5) = h.readTag()
                    if (f5 == 1 && w5 == 2)
                      (if (f4 == 9) histPoints
                       else if (f4 == 10) expHistPoints
                       else summaryPoints) += h.readMessage()
                    else h.skip(w5)
                  }
                } else metric.skip(w4)
              }
              dataPoints.foreach { case (attrs, tsMs, v) =>
                rows += Row(name, resourceAttrs.toMap ++ attrs, tsMs, v)
              }
              val emit = (n: String, tags: Map[String, String], tsMs: Long, v: Double) => {
                rows += Row(n, resourceAttrs.toMap ++ tags, tsMs, v)
                ()
              }
              // suffix expansion needs a metric name — nameless series
              // are skipped like the reference's native-histogram path
              // (write_request_unmarshaler.go:399)
              if (name != null) {
                histPoints.foreach(decodeHistogramDataPoint(_, name, emit))
                expHistPoints.foreach(decodeExpHistogramDataPoint(_, name, emit))
                summaryPoints.foreach(decodeSummaryDataPoint(_, name, emit))
              }
            } else sm.skip(w3)
          }
        }
      } else req.skip(w)
    }
    rows.iterator
  }

  /** parse stage: binary OTLP `payload` rows → canonical samples frame */
  def otlp(payloads: DataFrame): DataFrame = toSamplesDf(payloads, decodeOtlp)

  /** export: samples → one OTLP gauge payload per partition */
  def exportOtlp(samples: DataFrame): DataFrame = {
    val spark = samples.sparkSession
    val rdd = samples.select(col("name"), col("tags"), col("ts"), col("value"))
      .rdd.mapPartitions { it =>
        val byMetric = mutable.LinkedHashMap
          .empty[String, mutable.ArrayBuffer[(Seq[(String, String)], Long, Double)]]
        it.foreach { r =>
          val tags = Option(r.getMap[String, String](1))
            .map(_.toSeq.sortBy(_._1)).getOrElse(Nil)
          byMetric.getOrElseUpdate(r.getString(0), mutable.ArrayBuffer.empty) +=
            ((tags, r.getLong(2), r.getDouble(3)))
        }
        if (byMetric.isEmpty) Iterator.empty
        else {
          val sm = new Writer
          byMetric.foreach { case (name, points) =>
            val gauge = new Writer
            points.foreach { case (tags, tsMs, v) =>
              val dp = new Writer
              tags.foreach { case (k, vStr) =>
                dp.message(7, new Writer().string(1, k)
                  .message(2, new Writer().string(1, vStr)))
              }
              dp.fixed64(3, tsMs * 1000000L)
              dp.double(4, v)
              gauge.message(1, dp)
            }
            sm.message(2, new Writer().string(1, name).message(5, gauge))
          }
          val req = new Writer().message(1, new Writer().message(2, sm))
          Iterator.single(Row(req.bytes))
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(StructField("payload", BinaryType))))
  }

  /** Arithmetic OTLP histogram+summary payload fixture (gate support):
    * one ExportMetricsServiceRequest per partition carrying, per doc id,
    * a histogram `lat{doc=id}` (bounds [1,2], bucket counts
    * [id%3, (id/3)%3, (id/9)%3], sum id%50 only on EVEN ids — the
    * reference's sumless-histogram case) and a summary `q{doc=id}`
    * (count id%7, sum id%30, quantile 0.5 → id%9) — every decoded row is
    * exact integer arithmetic a SQL oracle can state.
    */
  def otlpHistSumFixture(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    val rdd = ids.select(col(ids.columns.head).cast("long")).rdd.mapPartitions { it =>
      val sm = new Writer
      var any = false
      it.foreach { r =>
        any = true
        val id = r.getLong(0)
        val tsNano = (1704067200000L + id * 1000L) * 1000000L
        def attrs(dp: Writer, field: Int): Unit =
          dp.message(field, new Writer().string(1, "doc")
            .message(2, new Writer().string(1, id.toString)))
        val h = new Writer
        attrs(h, 9)
        h.fixed64(3, tsNano)
        val b = Seq(id % 3, (id / 3) % 3, (id / 9) % 3)
        h.fixed64(4, b.sum)
        if (id % 2 == 0) h.double(5, (id % 50).toDouble)
        h.packedFixed64s(6, b)
        h.packedDoubles(7, Seq(1.0, 2.0))
        sm.message(2, new Writer().string(1, "lat")
          .message(9, new Writer().message(1, h)))
        val s = new Writer
        attrs(s, 7)
        s.fixed64(3, tsNano)
        s.fixed64(4, id % 7)
        s.double(5, (id % 30).toDouble)
        s.message(6, new Writer().double(1, 0.5).double(2, (id % 9).toDouble))
        sm.message(2, new Writer().string(1, "q")
          .message(11, new Writer().message(1, s)))
      }
      if (!any) Iterator.empty
      else Iterator.single(Row(
        new Writer().message(1, new Writer().message(2, sm)).bytes))
    }
    spark.createDataFrame(rdd, StructType(Seq(StructField("payload", BinaryType))))
  }

  // ------------------------------------------------------------------
  // DataDog sketches (/api/beta/sketches, lib/protoparser/datadogsketches)
  // ------------------------------------------------------------------

  // DDSketch mapping constants (datadogsketches/parser.go:12-19, taken
  // from DataDog's opentelemetry-mapping-go quantile config)
  private val ddEps = 1.0 / 128
  private val ddGamma = 1 + 2 * ddEps
  private val ddGammaLn = math.log1p(2 * ddEps)
  private val ddBias = 1 - math.floor(math.log(1e-9) / ddGammaLn).toInt
  private val ddQuantiles = Seq(0.5, 0.75, 0.9, 0.95, 0.99)
  private val ddQuantileStr = Map(
    0.5 -> "0.5", 0.75 -> "0.75", 0.9 -> "0.9", 0.95 -> "0.95", 0.99 -> "0.99")

  /** bucket key → value (datadogsketches/parser.go:355 f64) */
  private def ddF64(k: Int): Double =
    if (k <= -((1 << 15) - 1)) Double.NegativeInfinity
    else if (k >= (1 << 15) - 1) Double.PositiveInfinity
    else if (k == 0) 0.0
    else if (k < 0) -ddF64(-k)
    else math.pow(ddGamma, (k - ddBias).toDouble)

  /** interpolated quantile over one Dogsketch (parser.go:315) */
  private def ddQuantile(q: Double, cnt: Long, min: Double, max: Double,
      ks: Seq[Int], ns: Seq[Long]): Double = {
    if (cnt == 0) return 0.0
    if (q <= 0) return min
    if (q >= 1) return max
    if (ns.length != ks.length) return 0.0
    val rank = math.rint(q * (cnt - 1).toDouble)
    var acc = 0.0
    var i = 0
    while (i < ns.length) {
      acc += ns(i).toDouble
      if (acc > rank) {
        val weight = (acc - rank) / ns(i).toDouble
        var vLow = ddF64(ks(i))
        val vHigh = vLow * ddGamma
        if (i == 0) vLow = min
        return vLow * weight + vHigh * (1 - weight)
      }
      i += 1
    }
    max
  }

  /** decode one SketchPayload: each Dogsketch expands into the Prometheus
    * summary the reference synthesizes (parser.go:154 ToSummary) — one
    * series per quantile (label `quantile`) plus .sum/.count/.min/.max —
    * with host + split k:v tags (app/vminsert/datadogsketches:49).
    */
  def decodeDatadogSketches(raw: Array[Byte]): Iterator[Row] = {
    val req = new Reader(raw, 0, raw.length)
    val rows = mutable.ArrayBuffer.empty[Row]
    while (req.hasNext) {
      val (field, wt) = req.readTag()
      if (field == 1 && wt == 2) { // Sketch
        val sk = req.readMessage()
        var metric: String = null
        var host: String = null
        val tags = mutable.LinkedHashMap.empty[String, String]
        case class Dog(ts: Long, cnt: Long, min: Double, max: Double,
          sum: Double, ks: Seq[Int], ns: Seq[Long])
        val dogs = mutable.ArrayBuffer.empty[Dog]
        while (sk.hasNext) {
          val (f2, w2) = sk.readTag()
          (f2, w2) match {
            case (1, 2) => metric = sk.readString()
            case (2, 2) => host = sk.readString()
            case (4, 2) =>
              val t = sk.readString()
              val i = t.indexOf(':')
              if (i >= 0) tags(t.substring(0, i)) = t.substring(i + 1)
              else tags(t) = ""
            case (7, 2) => // Dogsketch
              val d = sk.readMessage()
              var ts = 0L; var cnt = 0L
              var mn = 0.0; var mx = 0.0; var sm = 0.0
              var ks: Seq[Int] = Nil; var ns: Seq[Long] = Nil
              while (d.hasNext) {
                val (f3, w3) = d.readTag()
                (f3, w3) match {
                  case (1, 0) => ts = d.readVarint()
                  case (2, 0) => cnt = d.readVarint()
                  case (3, 1) => mn = d.readDouble()
                  case (4, 1) => mx = d.readDouble()
                  case (6, 1) => sm = d.readDouble()
                  case (7, 2) => // packed sint32 (zigzag)
                    ks = d.readPackedVarints().map(z =>
                      ((z >>> 1) ^ -(z & 1)).toInt)
                  case (8, 2) => ns = d.readPackedVarints()
                  case (_, w) => d.skip(w)
                }
              }
              dogs += Dog(ts, cnt, mn, mx, sm, ks, ns)
            case (_, w) => sk.skip(w)
          }
        }
        if (metric != null) {
          val baseTags = (if (host != null && host.nonEmpty)
            Map("host" -> host) else Map.empty[String, String]) ++ tags
          dogs.foreach { d =>
            val tsMs = d.ts * 1000
            ddQuantiles.foreach { q =>
              rows += Row(metric, baseTags + ("quantile" -> ddQuantileStr(q)),
                tsMs, ddQuantile(q, d.cnt, d.min, d.max, d.ks, d.ns))
            }
            rows += Row(metric + ".sum", baseTags, tsMs, d.sum)
            rows += Row(metric + ".count", baseTags, tsMs, d.cnt.toDouble)
            rows += Row(metric + ".min", baseTags, tsMs, d.min)
            rows += Row(metric + ".max", baseTags, tsMs, d.max)
          }
        }
      } else req.skip(wt)
    }
    rows.iterator
  }

  /** parse stage: binary sketch `payload` rows → canonical samples frame */
  def datadogSketches(payloads: DataFrame): DataFrame =
    toSamplesDf(payloads, decodeDatadogSketches)

  /** export: each sample becomes a single-observation Dogsketch (cnt=1,
    * min=max=sum=value) inside one SketchPayload per partition — a valid
    * agent payload whose parsed summary is fully determined by the input
    * (every quantile of a 1-sample sketch is the sample itself).
    */
  def exportDatadogSketches(samples: DataFrame): DataFrame = {
    val spark = samples.sparkSession
    val rdd = samples.select(col("name"), col("tags"), col("ts"), col("value"))
      .rdd.mapPartitions { it =>
        val payload = new Writer
        var any = false
        it.foreach { r =>
          any = true
          val tags = Option(r.getMap[String, String](1))
            .map(_.toSeq.sortBy(_._1)).getOrElse(Nil)
          val v = r.getDouble(3)
          val dog = new Writer()
            .int64(1, r.getLong(2) / 1000) // ts seconds
            .int64(2, 1L) // cnt
            .double(3, v).double(4, v).double(6, v)
          // k: zigzag(0) packed; n: [1] packed
          dog.tag(7, 2); dog.varint(1); dog.varint(0)
          dog.tag(8, 2); dog.varint(1); dog.varint(1)
          val sk = new Writer().string(1, r.getString(0))
          tags.foreach { case (k, tv) => sk.string(4, k + ":" + tv) }
          sk.message(7, dog)
          payload.message(1, sk)
        }
        if (any) Iterator.single(Row(payload.bytes)) else Iterator.empty
      }
    spark.createDataFrame(rdd, StructType(Seq(StructField("payload", BinaryType))))
  }
}

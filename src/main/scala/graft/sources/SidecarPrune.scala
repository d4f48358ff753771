package graft.sources

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.unsafe.types.UTF8String

/** The one shared file-skipping analysis both SQL scan builders run
  * inside `pushFilters` (the flat [[GraftCatalog]] table and the
  * partition-evolved union table): resolve pushed Catalyst predicates
  * against the manifest's stats sidecar (per-column typed bounds,
  * identified by the `#statcol` name:kind header) and the per-file
  * Bloom sidecars, and return the files that may still hold matching
  * rows. Entirely driver-side: sidecars are read once per column,
  * Bloom probe positions are driver arithmetic ([[BloomIndex
  * .positions]]), no Spark job is ever scheduled at plan time.
  * Unsupported predicate shapes prune nothing — correctness never
  * depends on pruning, only IO does. */
private[sources] object SidecarPrune {

  private def longOf(l: Literal): Option[Long] = l.dataType match {
    case org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.ShortType =>
      Option(l.value).map(_.toString.toLong)
    // a timestamp literal's Catalyst value IS epoch-micros — the
    // same domain the `ts`-kind sidecar stores bounds in
    case org.apache.spark.sql.types.TimestampType =>
      Option(l.value).map(_.asInstanceOf[Long])
    case _ => None
  }

  private def strOf(l: Literal): Option[UTF8String] = l.dataType match {
    case org.apache.spark.sql.types.StringType =>
      Option(l.value).map(_.asInstanceOf[UTF8String])
    case _ => None
  }

  /** Files of `all` that survive every sidecar test for `filters` at
    * version `v` of `root`. */
  def survivors(root: String, v: Int, filters: Seq[Expression],
      all: Seq[String]): Seq[String] = {
    var lo = Map.empty[String, Long]
    var hi = Map.empty[String, Long]
    // string bounds compare byte-wise unsigned (UTF8String) — the
    // ordering Spark's min/max used when the sidecar was built
    var sLo = Map.empty[String, UTF8String]
    var sHi = Map.empty[String, UTF8String]
    // per column: the key SETS the predicate restricts it to (an
    // equality is a 1-element set, an IN-list its values) — a file
    // survives a set when it may contain ANY member
    var keySets = Map.empty[String, Seq[Long]]
    def tightenLo(c: String, x: Long): Unit =
      lo += c -> math.max(x, lo.getOrElse(c, Long.MinValue))
    def tightenHi(c: String, x: Long): Unit =
      hi += c -> math.min(x, hi.getOrElse(c, Long.MaxValue))
    // strict string bounds relax to inclusive — conservative: keeps
    // at most the boundary file it could have skipped
    def tightenSLo(c: String, x: UTF8String): Unit =
      sLo += c -> sLo.get(c).filter(_.compareTo(x) >= 0).getOrElse(x)
    def tightenSHi(c: String, x: UTF8String): Unit =
      sHi += c -> sHi.get(c).filter(_.compareTo(x) <= 0).getOrElse(x)
    def keySet(c: String, ks: Seq[Long]): Unit = {
      keySets += c -> ks
      tightenLo(c, ks.min); tightenHi(c, ks.max)
    }
    def bound(a: String, l: Literal, isLo: Boolean, strict: Boolean)
        : Unit = {
      longOf(l).foreach { k =>
        val adj = if (strict) (if (isLo) k + 1 else k - 1) else k
        if (isLo) tightenLo(a, adj) else tightenHi(a, adj)
      }
      strOf(l).foreach(x => if (isLo) tightenSLo(a, x) else tightenSHi(a, x))
    }
    filters.foreach {
      case EqualTo(a: AttributeReference, l: Literal) =>
        longOf(l).foreach(k => keySet(a.name, Seq(k)))
        strOf(l).foreach { x => tightenSLo(a.name, x); tightenSHi(a.name, x) }
      case EqualTo(l: Literal, a: AttributeReference) =>
        longOf(l).foreach(k => keySet(a.name, Seq(k)))
        strOf(l).foreach { x => tightenSLo(a.name, x); tightenSHi(a.name, x) }
      case In(a: AttributeReference, vs)
          if vs.nonEmpty && vs.size <= 64 &&
            vs.forall(_.isInstanceOf[Literal]) =>
        val ks = vs.flatMap(x => longOf(x.asInstanceOf[Literal]))
        if (ks.size == vs.size) keySet(a.name, ks)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        bound(a.name, l, isLo = true, strict = false)
      case GreaterThan(a: AttributeReference, l: Literal) =>
        bound(a.name, l, isLo = true, strict = true)
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        bound(a.name, l, isLo = false, strict = false)
      case LessThan(a: AttributeReference, l: Literal) =>
        bound(a.name, l, isLo = false, strict = true)
      case _ => // unsupported shape: prunes nothing
    }
    // per-column typed pruning: every constrained column that the
    // #statcol header names (name:kind) intersects the survivor set.
    // Column identity is resolved through the header — bounds of one
    // column NEVER prune by another's predicate.
    val kinds = SnapshotStore.statCols(root, v)
    val afterStats = kinds.foldLeft(all) { case (fs, (c, kind)) =>
      kind match {
        case "long" | "ts" if lo.contains(c) || hi.contains(c) =>
          val (l, h) = (lo.getOrElse(c, Long.MinValue),
            hi.getOrElse(c, Long.MaxValue))
          val stats = SnapshotStore.boundsFor(root, v, c)
          fs.filter(f => stats.get(f).forall { case (mn, mx) =>
            mx >= l && mn <= h })
        case "str" if sLo.contains(c) || sHi.contains(c) =>
          val stats = SnapshotStore.strBoundsFor(root, v, c)
          fs.filter(f => stats.get(f).forall { case (mn, mx) =>
            sLo.get(c).forall(l =>
              UTF8String.fromString(mx).compareTo(l) >= 0) &&
            sHi.get(c).forall(h =>
              UTF8String.fromString(mn).compareTo(h) <= 0) })
        case _ => fs
      }
    }
    // Bloom probes only the stats survivors; absent sidecars no-op.
    // A key SET keeps the union of per-key survivors (a file may
    // serve any member). One sidecar read per column, driver-side
    // probe arithmetic — never a Spark job at plan time.
    keySets.foldLeft(afterStats) { case (fs, (c, ks)) =>
      BloomIndex.loadSidecar(root, v, c) match {
        case None => fs
        case Some(blooms) => fs.filter(p =>
          blooms.get(p).forall(bits => ks.exists(BloomIndex.covers(bits, _))))
      }
    }
  }
}

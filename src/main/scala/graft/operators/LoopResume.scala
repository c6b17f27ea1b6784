package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** DRIVER-crash resumability for iterative loops — the durability
  * class [[LoopState]]'s reliable dial does not cover: reliable
  * checkpoints let a loop survive EXECUTOR loss (blocks are re-read
  * from files), but the round counter, the convergence delta and the
  * frame references live on the driver, so a driver crash still
  * restarts a multi-hour corpus-scale loop from round 0.
  *
  * An opted-in loop commits each round to `dir/round_N`: the rank
  * vector as parquet plus a `_meta.json` carrying (round, delta, eps,
  * src), written under `_tmp_round_N` and RENAMED into place — the
  * rename is the commit, so a crash mid-write leaves only an ignored
  * tmp dir and every committed round is complete. On start the loop
  * reads the newest committed round and continues from there; meta
  * mismatches (different eps or source dataset) fail loudly instead
  * of silently resuming someone else's loop. Storage is bounded like
  * [[LoopState.Loop]]: committing round N drops rounds < N-1.
  *
  * Integer rank vectors round-trip parquet exactly (long columns),
  * so a resumed run is bit-identical to an uninterrupted one —
  * GraphSpec proves it by crashing a run mid-loop (iteration budget
  * exhausted after 3 committed rounds) and resuming to the same
  * vector and count as the uninterrupted reference.
  *
  * Orthogonal to `GRAFT_LOOP_CHECKPOINT=reliable`, and combining them
  * double-writes the state per round (reliable checkpoint + this
  * commit; pagerank additionally truncates the 3-column withPrev
  * frame while committing the 2-column vector, so the two artifacts
  * aren't interchangeable). A deployment typically picks ONE per
  * failure domain: reliable checkpoints if executor churn dominates,
  * resume commits if driver restarts do — measured ~0.1 s/round each
  * at harness scales (`Dev resumebench`, SCALING.md round-14).
  */
object LoopResume {

  private val Round = "round_([0-9]+)".r

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Newest committed round under `dir`, with its recorded delta and
    * vector; None when no round has committed. Fails loudly when the
    * recorded stamp/src disagree with the caller's — a resume dir is
    * scoped to ONE loop over ONE dataset at ONE convergence setting
    * by contract (pagerank stamps its eps; components stamp 0 and
    * identify the edge set via the caller's tag).
    */
  def latest(spark: SparkSession, dir: String, stamp: Long,
      src: String): Option[(Int, Long, DataFrame)] = {
    val (fs, root) = fsOf(spark, dir)
    if (!fs.exists(root)) return None
    val rounds = fs.listStatus(root).toSeq.flatMap { st =>
      st.getPath.getName match {
        case Round(n) => Some((n.toInt, st.getPath))
        case _        => None
      }
    }
    rounds.sortBy(-_._1).headOption.map { case (n, p) =>
      val meta = readMeta(fs, new Path(p, "_meta.json"))
      require(meta.getOrElse("round", -1L) == n.toLong,
        s"corrupt loop commit $p: meta round ${meta.get("round")} != dir round $n")
      require(meta.getOrElse("stamp", -1L) == stamp,
        s"resume dir $dir was committed at convergence stamp " +
          s"${meta.get("stamp")}, caller wants $stamp (e.g. a different eps)")
      require(meta.getOrElse("srcHash", -1L) == srcHash(src),
        s"resume dir $dir was committed for a different source dataset")
      (n, meta("delta"), spark.read.parquet(p.toString))
    }
  }

  /** Atomically commit round `n`'s vector + meta; drops rounds < n-1. */
  def commit(vector: DataFrame, dir: String, n: Int, delta: Long,
      stamp: Long, src: String): Unit = {
    val spark = vector.sparkSession
    val (fs, root) = fsOf(spark, dir)
    val tmp = new Path(root, s"_tmp_round_$n")
    val fin = new Path(root, s"round_$n")
    fs.delete(tmp, true) // stale from a crashed earlier commit
    fs.delete(fin, true) // re-commit after a crash between commit and round++
    vector.write.mode("overwrite").parquet(tmp.toString)
    val out = fs.create(new Path(tmp, "_meta.json"), true)
    try out.write(
      s"""{"round":$n,"delta":$delta,"stamp":$stamp,"srcHash":${srcHash(src)}}"""
        .getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, fin))
      throw new java.io.IOException(s"loop commit rename $tmp -> $fin failed")
    for (st <- fs.listStatus(root)) st.getPath.getName match {
      case Round(k) if k.toInt < n - 1 =>
        // best-effort, like LoopState's cleanup: stale rounds are
        // storage waste, never state
        try fs.delete(st.getPath, true)
        catch { case _: java.io.IOException => () }
      case _ => ()
    }
  }

  /** Stable content stamp of the source-dir string (NOT the data):
    * catches the pointed-the-resume-dir-at-the-wrong-dataset footgun
    * cheaply; full data validation would cost a scan per resume.
    */
  private def srcHash(src: String): Long =
    src.foldLeft(1125899906842597L)((h, c) => 31 * h + c)

  /** Minimal flat-json long-field reader for the meta file — the
    * committed meta is machine-written single-line {"k":long,...}.
    */
  private def readMeta(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Map[String, Long] = {
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    "\"([a-zA-Z]+)\"\\s*:\\s*(-?[0-9]+)".r.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
  }
}

package graft

/** Generator for `OPERATORS.md` — the human index mapping every driver
  * query id to the public operator it exercises, the operator's
  * definition site, and a one-line purpose (r14 verdict #6).
  *
  * The index is GENERATED from `SparkEntry.scala` itself (the query
  * blocks' leading comments and first public-operator call) plus a
  * `def`-site scan of `src/main` — so it cannot drift from the code: the
  * golden spec re-renders it and fails on any difference, and every
  * `SparkEntry.queries` id must appear or the render itself fails.
  *
  * Usage: `runMain graft.OperatorIndex` (writes `OPERATORS.md` at the
  * repo root; pass an argument to write elsewhere).
  */
object OperatorIndex {

  final case class Entry(
      query: String, operator: String, where: String, purpose: String)

  private val entryStart =
    """^\s*"(q\w+)" -> \(\(s, d\) =>( \{)?\s*$""".r
  // the first public operator invocation inside a query body: an
  // object (or qualified object) dot lower-case method call. graft's
  // function bags `text`/`vectors` are lower-case objects — matched by
  // the qualified alternative.
  private val opCall =
    ("""(?:graft\.functions\.|\b)(text|vectors)\.(\w+)\(|""" +
      // (?<![\w.]) left boundary: without it "sameLabel.groupBy(" parses
      // as a phantom operator "Label.groupBy" (round-17 review finding)
      """(?<![\w.])((?:graft\.)?(?:[a-z][a-z0-9]*\.)*[A-Z][A-Za-z0-9]*)\.([a-z]\w*)\(""").r

  /** Strip a query block's leading `//` comment run into one purpose
    * line (first sentence, capped).
    */
  private def purposeOf(body: Seq[String]): String = {
    val comment = body.takeWhile(_.trim.startsWith("//"))
      .map(_.trim.stripPrefix("//").trim).mkString(" ")
    val txt = if (comment.nonEmpty) comment else "see the query body"
    val cut = txt.indexOf(". ") match {
      case -1 => txt
      case i => txt.take(i + 1)
    }
    val t = cut.trim
    (if (t.length > 160) t.take(157) + "..." else t).capitalize
  }

  private def operatorOf(body: Seq[String]): String = {
    val noComments = body.map { l =>
      val i = l.indexOf("//")
      if (i >= 0) l.take(i) else l
    }
    // JVM/stdlib plumbing that can precede the real operator call in a
    // body (fixture building, stream-name counters) — skip past it
    val deny = Set("Array", "Counter", "Seq", "Option", "Some", "Math",
      "String", "File", "Files")
    noComments.iterator.flatMap(opCall.findAllMatchIn).collectFirst {
      case m if m.group(1) != null => s"${m.group(1)}.${m.group(2)}"
      case m if !deny(m.group(3).split('.').last) =>
        val obj = m.group(3).stripPrefix("graft.")
        s"$obj.${m.group(4)}"
    }.getOrElse("DataFrame/SQL composition")
  }

  /** `file:line` of `def <method>` under src/main (first hit, searched
    * with the object's file as a tie-break); the composition rows point
    * at SparkEntry itself.
    */
  private def defSites(srcRoot: java.io.File): Map[String, Seq[(String, Int)]] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val defRe = """^\s*(?:override )?(?:private\S* )?def (\w+)[\[(:]""".r
    walk(srcRoot).flatMap { f =>
      val rel = f.getPath.replaceFirst("^.*?src/main/scala/", "src/main/scala/")
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().zipWithIndex.flatMap {
        case (line, i) => defRe.findFirstMatchIn(line).map(m =>
          (m.group(1), (rel, i + 1)))
      }.toList
      finally src.close()
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
  }

  /** Parse the query blocks of SparkEntry.scala into index entries. */
  def entries(sparkEntrySource: Seq[String], srcRoot: java.io.File): Seq[Entry] = {
    val sites = defSites(srcRoot)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
    var i = 0
    while (i < sparkEntrySource.length) {
      sparkEntrySource(i) match {
        case entryStart(q, brace) =>
          // brace-form bodies end at the dedented `}),`; expression-form
          // bodies (no brace) end at their first `)),` line
          val rest = sparkEntrySource.drop(i + 1)
          val body =
            if (brace != null)
              rest.takeWhile(l => !l.matches("""^    \}\),?\s*$"""))
            else {
              val upto = rest.indexWhere(_.trim.endsWith(")),"))
              rest.take(if (upto < 0) 0 else upto + 1)
            }
          blocks += ((q, body.toSeq))
          i += body.length
        case _ =>
      }
      i += 1
    }
    blocks.toSeq.map { case (q, body) =>
      val op = operatorOf(body)
      val where = op match {
        case "DataFrame/SQL composition" => "src/main/scala/graft/SparkEntry.scala"
        case o =>
          val m = o.split('.').last
          val hits = sites.getOrElse(m, Nil)
          // case-INSENSITIVE file match: the function bags are lowercase
          // objects in lowercase files (text.scala), where capitalize
          // could never match and the alphabetically-first definition
          // (a different object's) won the citation
          val objFile = o.split('.').dropRight(1).lastOption.map(_.toLowerCase)
          hits.sortBy { case (f, _) =>
            (if (objFile.exists(of =>
              f.toLowerCase.endsWith(s"/$of.scala"))) 0 else 1, f)
          }.headOption.map { case (f, l) => s"$f:$l" }
            .getOrElse("src/main/scala/graft/SparkEntry.scala")
      }
      Entry(q, op, where, purposeOf(body))
    }.sortBy(e => (e.query.drop(1).takeWhile(_.isDigit).toInt, e.query))
  }

  def render(es: Seq[Entry], declared: Set[String]): String = {
    val missing = declared -- es.map(_.query).toSet
    require(missing.isEmpty,
      s"OPERATORS.md would miss declared queries: ${missing.toSeq.sorted.mkString(", ")}")
    val sb = new StringBuilder
    sb ++= "# Operator index\n\n"
    sb ++= "GENERATED by `runMain graft.OperatorIndex` — do not edit by hand\n"
    sb ++= "(the golden spec re-renders and diffs this file). Two views of\n"
    sb ++= "the same mapping: public operator -> queries, then the full\n"
    sb ++= "per-query table with definition sites and one-line purposes.\n\n"
    sb ++= "## Operators\n\n"
    sb ++= "| operator | defined at | driver queries |\n|---|---|---|\n"
    es.groupBy(e => (e.operator, e.where)).toSeq
      .sortBy { case ((op, _), _) => op.toLowerCase }
      .foreach { case ((op, where), qs) =>
        sb ++= s"| `$op` | $where | ${qs.map(_.query).sorted.mkString(", ")} |\n"
      }
    sb ++= "\n## Queries\n\n"
    sb ++= "| query | operator | purpose |\n|---|---|---|\n"
    es.foreach { e =>
      sb ++= s"| ${e.query} | `${e.operator}` | ${e.purpose} |\n"
    }
    sb.toString
  }

  def generate(repoRoot: String): String = {
    val f = scala.io.Source.fromFile(
      s"$repoRoot/src/main/scala/graft/SparkEntry.scala", "UTF-8")
    val src = try f.getLines().toSeq finally f.close()
    render(entries(src, new java.io.File(s"$repoRoot/src/main/scala")),
      SparkEntry.queries.keySet)
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("OPERATORS.md")
    java.nio.file.Files.write(new java.io.File(out).toPath,
      generate(".").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote $out")
  }
}

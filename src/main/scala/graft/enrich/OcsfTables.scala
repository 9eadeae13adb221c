package graft.enrich

import scala.collection.mutable

/** Full OCSF schema tables for ALL event classes and nested object types of
  * every spec version the reference ships (v1.0.0 .. v1.7.0) — loaded from
  * `graft/ocsf_schema.tsv`, which `tools/gen_ocsf_schema.py` extracts
  * mechanically from the reference's GENERATED per-version validators and
  * declarative requirement tables
  * (ocsfstandardizationprocessor/ocsf/v1_x_y/schema.go: `classFieldReqs`,
  * `objectFieldReqs`, `ValidateClass` dispatch, and the per-class validator
  * bodies; those files are themselves generated from the public
  * schema.ocsf.io exports). Carrying the tables as data instead of 168k
  * generated Go lines keeps every class of every version configurable —
  * the same any-class-any-version surface as config.go:27-41.
  */
object OcsfTables {

  /** One owner's (event class or object type) requirement set:
    * schema.go `fieldReqs` + the validator-derived enum/maxlen constraints.
    */
  case class Reqs(
      required: Seq[String] = Nil,
      atLeastOne: Seq[Seq[String]] = Nil,
      justOne: Seq[Seq[String]] = Nil,
      fieldTypes: Map[String, String] = Map.empty,
      objectFields: Map[String, String] = Map.empty,
      enums: Map[String, Seq[Long]] = Map.empty,
      maxLens: Map[String, Int] = Map.empty)

  case class VersionSchema(
      classes: Map[Int, Reqs],
      classNames: Map[Int, String],
      objects: Map[String, Reqs])

  lazy val byVersion: Map[String, VersionSchema] = load()

  def versions: Seq[String] = byVersion.keys.toSeq.sorted

  /** Exact-version lookup with DETERMINISTIC lenient fallback, both
    * directions: a short prefix resolves to the lowest matching version
    * ("1.1" → "1.1.0"), and an unknown patch/suffix resolves through its
    * major.minor family ("1.1.2", "1.1.0-rc" → "1.1.0") — the behavior the
    * previous hand tables' startsWith("1.1") check gave.
    */
  def forVersion(v: String): Option[VersionSchema] = {
    lazy val sorted = byVersion.toSeq.sortBy(_._1)
    lazy val majorMinor = v.split("\\.").take(2).mkString(".")
    byVersion.get(v)
      .orElse(sorted.collectFirst { case (k, s) if k.startsWith(v) => s })
      .orElse(sorted.collectFirst {
        case (k, s) if majorMinor.nonEmpty && k.startsWith(majorMinor) => s })
  }

  /** LookupFieldType parity (schema.go:18916-18938): resolve a dotted `to`
    * path through object field definitions to its coercion type name.
    */
  def lookupFieldType(version: String, classUid: Int, path: String): Option[String] =
    forVersion(version).flatMap { vs =>
      def go(reqs: Reqs, p: String): Option[String] = {
        val (top, sub) = splitFirst(p)
        if (sub.isEmpty) reqs.fieldTypes.get(top)
        else for {
          objType <- reqs.objectFields.get(top)
          objReqs <- vs.objects.get(objType)
          t <- go(objReqs, sub)
        } yield t
      }
      vs.classes.get(classUid).flatMap(go(_, path))
    }

  /** ValidateMappingCoverage parity (schema.go:18820-18900): config-time
    * validation that the mapped `to` paths cover every required field,
    * satisfy at-least-one / just-one groups, and recursively cover nested
    * object requirements wherever a mapping descends into an object field.
    * Returns the error list (empty = valid).
    */
  def validateMappingCoverage(version: String, classUid: Int,
                              paths: Seq[String]): Seq[String] = {
    val vs = forVersion(version).getOrElse(
      return Seq(s"unknown OCSF version '$version'"))
    val reqs = vs.classes.getOrElse(classUid,
      return Seq(s"unknown OCSF class $classUid for version $version"))

    def go(r: Reqs, ps: Seq[String], prefix: String): Seq[String] = {
      val split = ps.map(splitFirst)
      val covered = split.map(_._1).toSet
      val grouped = split.filter(_._2.nonEmpty).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2) }
      val errs = mutable.ArrayBuffer[String]()
      r.required.foreach { f =>
        if (!covered(f)) errs += s"""missing required field "$prefix$f""""
      }
      r.atLeastOne.foreach { g =>
        if (!g.exists(covered)) errs +=
          s"at least one of ${g.map(prefix + _).mkString("[", " ", "]")} must be mapped"
      }
      r.justOne.foreach { g =>
        val n = g.count(covered)
        if (n != 1) errs +=
          s"exactly one of ${g.map(prefix + _).mkString("[", " ", "]")} must be mapped, got $n"
      }
      grouped.toSeq.sortBy(_._1).foreach { case (field, subPaths) =>
        for {
          objType <- r.objectFields.get(field)
          objReqs <- vs.objects.get(objType)
        } errs ++= go(objReqs, subPaths, s"$prefix$field.")
      }
      errs.toSeq
    }
    go(reqs, paths, "")
  }

  private def splitFirst(s: String): (String, String) = {
    val i = s.indexOf('.')
    if (i < 0) (s, "") else (s.substring(0, i), s.substring(i + 1))
  }

  private def load(): Map[String, VersionSchema] = {
    val in = getClass.getResourceAsStream("/graft/ocsf_schema.tsv")
    require(in != null, "graft/ocsf_schema.tsv missing from classpath " +
      "(regenerate with tools/gen_ocsf_schema.py)")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()

    case class Acc(
        required: mutable.ArrayBuffer[String] = mutable.ArrayBuffer(),
        atLeastOne: mutable.ArrayBuffer[Seq[String]] = mutable.ArrayBuffer(),
        justOne: mutable.ArrayBuffer[Seq[String]] = mutable.ArrayBuffer(),
        fieldTypes: mutable.Map[String, String] = mutable.Map(),
        objectFields: mutable.Map[String, String] = mutable.Map(),
        enums: mutable.Map[String, Seq[Long]] = mutable.Map(),
        maxLens: mutable.Map[String, Int] = mutable.Map()) {
      def toReqs: Reqs = Reqs(required.toSeq, atLeastOne.toSeq, justOne.toSeq,
        fieldTypes.toMap, objectFields.toMap, enums.toMap, maxLens.toMap)
    }
    val owners = mutable.Map[(String, String), Acc]()
    val classNames = mutable.Map[(String, Int), String]()
    def acc(ver: String, owner: String): Acc =
      owners.getOrElseUpdate((ver, owner), Acc())
    def kvMap(s: String): Seq[(String, String)] =
      s.split(',').toSeq.filter(_.nonEmpty).map { kv =>
        val i = kv.lastIndexOf(':'); (kv.substring(0, i), kv.substring(i + 1))
      }

    lines.foreach { line =>
      val f = line.split('\t')
      f(0) match {
        case "C" => classNames((f(1), f(2).toInt)) = f(3)
        case "R" => acc(f(1), f(2)).required ++= f(3).split(',')
        case "A" => acc(f(1), f(2)).atLeastOne += f(3).split(',').toSeq
        case "J" => acc(f(1), f(2)).justOne += f(3).split(',').toSeq
        case "T" => acc(f(1), f(2)).fieldTypes ++= kvMap(f(3))
        case "O" => acc(f(1), f(2)).objectFields ++= kvMap(f(3))
        case "E" => acc(f(1), f(2)).enums(f(3)) =
          f(4).split(',').toSeq.map(_.toLong)
        case "L" => acc(f(1), f(2)).maxLens ++=
          kvMap(f(3)).map { case (k, v) => k -> v.toInt }
        case other => throw new IllegalStateException(
          s"bad ocsf_schema.tsv record kind '$other'")
      }
    }
    owners.keys.map(_._1).toSeq.distinct.map { ver =>
      val classes = owners.collect {
        case ((v, o), a) if v == ver && o.startsWith("c") =>
          o.drop(1).toInt -> a.toReqs
      }.toMap
      val objects = owners.collect {
        case ((v, o), a) if v == ver && o.startsWith("o") =>
          o.drop(1) -> a.toReqs
      }.toMap
      val names = classNames.collect {
        case ((v, uid), n) if v == ver => uid -> n }.toMap
      ver -> VersionSchema(classes, names, objects)
    }.toMap
  }
}

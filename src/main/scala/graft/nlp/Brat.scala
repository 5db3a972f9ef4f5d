package graft.nlp

import java.text.Normalizer

/** BRAT (.txt/.ann) corpus loader (reference architxt/nlp/brat.py:21-168
  * + nlp/utils.py:16-150) with a self-contained .ann parser replacing
  * pybrat: `T<i>\tTYPE start end\ttext` entity lines and
  * `R<i>\tTYPE Arg1:T<a> Arg2:T<b>` relation lines.
  */
object Brat {

  final case class BratEntity(id: String, tpe: String, start: Int, end: Int, mention: String)
  final case class BratRelation(tpe: String, arg1: String, arg2: String)
  final case class Example(text: String, entities: Seq[BratEntity], relations: Seq[BratRelation])

  /** Parse the .ann side of a BRAT document. Unknown line kinds (*, E, N,
    * AM, A…) are ignored like the reference's BratParser config.
    */
  def parseAnn(ann: String): (Seq[BratEntity], Seq[BratRelation]) = {
    val entities = Vector.newBuilder[BratEntity]
    val relations = Vector.newBuilder[BratRelation]
    ann.linesIterator.filter(_.nonEmpty).foreach { line =>
      val parts = line.split("\t")
      if (parts.length >= 2) {
        val id = parts(0)
        if (id.startsWith("T") && parts.length >= 3) {
          // span may be discontinuous "start end;start end" — first start,
          // last end (brat.py:55-57)
          val header = parts(1).split(" ", 2)
          if (header.length == 2) {
            val spans = header(1).split(";").map(_.trim.split(" "))
            val ok = spans.forall(s => s.length == 2 && s.forall(_.forall(_.isDigit)))
            if (ok) entities += BratEntity(
              id, header(0), spans.head(0).toInt, spans.last(1).toInt, parts(2))
          }
        } else if (id.startsWith("R")) {
          val fields = parts(1).split(" ")
          if (fields.length >= 3) {
            val arg1 = fields.find(_.startsWith("Arg1:")).map(_.stripPrefix("Arg1:"))
            val arg2 = fields.find(_.startsWith("Arg2:")).map(_.stripPrefix("Arg2:"))
            for (a <- arg1; b <- arg2) relations += BratRelation(fields(0), a, b)
          }
        }
      }
    }
    (entities.result(), relations.result())
  }

  /** unidecode-lite: strip combining marks (nlp/utils.py:16-29). */
  def asciiFold(s: String): String =
    Normalizer.normalize(s, Normalizer.Form.NFKD).replaceAll("\\p{M}", "")

  def splitSentences(text: String): Seq[String] = asciiFold(text).split("\n", -1).toSeq

  /** Assign entities to sentences, re-anchoring offsets
    * (nlp/utils.py:32-98 semantics): sentence i covers
    * [offset, offset + len]; +1 for the newline between sentences.
    */
  def splitEntities(entities: Seq[Entity], sentences: Seq[String]): Seq[Seq[Entity]] = {
    val sorted = entities.sortBy(e => (e.start, e.end))
    var offset = 0
    sentences.map { sentence =>
      val end = offset + sentence.length
      val within = sorted.filter(e => e.start >= offset && e.end <= end)
        .map(e => e.copy(start = e.start - offset, end = e.end - offset))
      offset = end + 1
      within
    }
  }

  /** Keep only relations whose two endpoints live in the same sentence. */
  def splitRelations(relations: Seq[Relation], entities: Seq[Seq[Entity]]): Seq[Seq[Relation]] =
    entities.map { sentenceEnts =>
      val ids = sentenceEnts.map(_.id).toSet
      relations.filter(r => ids.contains(r.src) && ids.contains(r.dst))
    }

  /** convert_brat_entities (brat.py:21-69): uppercase + rename + filter;
    * id = the span tuple; value = lowercased mention.
    */
  def convertEntities(
      entities: Seq[BratEntity],
      allowList: Set[String] = Set.empty,
      mapping: Map[String, String] = Map.empty,
  ): Seq[Entity] =
    entities.flatMap { be =>
      val tag0 = be.tpe.toUpperCase
      val tag = mapping.getOrElse(tag0, tag0)
      Option.when(!allowList.contains(tag))(
        Entity(tag, be.start, be.end, be.id, be.mention.toLowerCase))
    }

  /** convert_brat_relations (brat.py:72-112): endpoints by entity id;
    * INCERTAIN relations always dropped.
    */
  def convertRelations(
      relations: Seq[BratRelation],
      allowList: Set[String] = Set.empty,
      mapping: Map[String, String] = Map.empty,
  ): Seq[Relation] =
    relations.flatMap { br =>
      val name0 = br.tpe.toUpperCase
      val name = mapping.getOrElse(name0, name0)
      Option.when(!allowList.contains(name) && !name.contains("INCERTAIN"))(
        Relation(br.arg1, br.arg2, name))
    }

  /** One BRAT document → annotated sentences (brat.py:115-150). */
  def convertExample(
      example: Example,
      entitiesFilter: Set[String] = Set.empty,
      relationsFilter: Set[String] = Set.empty,
      entitiesMapping: Map[String, String] = Map.empty,
      relationsMapping: Map[String, String] = Map.empty,
  ): Seq[AnnotatedSentence] = {
    val sentences = splitSentences(example.text)
    val ents = splitEntities(
      convertEntities(example.entities, entitiesFilter, entitiesMapping), sentences)
    val rels = splitRelations(
      convertRelations(example.relations, relationsFilter, relationsMapping), ents)
    sentences.lazyZip(ents).lazyZip(rels).collect {
      case (s, e, r) if s.nonEmpty && e.nonEmpty => AnnotatedSentence(s, e, r)
    }.toSeq
  }

  /** Parse a (txt, ann) pair into annotated sentences — the per-row
    * function for `spark.read.text`-based corpus ingestion.
    */
  def parseDocument(txt: String, ann: String): Seq[AnnotatedSentence] = {
    val (es, rs) = parseAnn(ann)
    convertExample(Example(txt, es, rs))
  }

  /** (docBase, txt, ann) per document from BRAT ARCHIVES — the
    * reference's tar.gz/zip corpus shape (nlp/__init__.py:168-231,
    * brat.py:115-168), without its extract-to-temp-dir step: one Spark
    * task streams one archive's entries (archives are unsplittable
    * containers, so the parallel unit IS the archive — a 100 TB corpus
    * arrives as many archives, and `pattern` globs them all). Buffering
    * one archive's (txt, ann) map in its task is the same bound the
    * reference accepts when it extracts one archive to a temp dir.
    */
  def archiveDocuments(
      spark: org.apache.spark.sql.SparkSession,
      pattern: String,
  ): org.apache.spark.sql.Dataset[(String, String, String)] = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(pattern).flatMap { case (path, pds) =>
      val in = pds.open()
      try {
        val byBase = scala.collection.mutable.Map.empty[String, (Option[String], Option[String])]
        Archive.entries(path, in).foreach { case (entry, bytes) =>
          val dot = entry.lastIndexOf('.')
          if (dot > 0) {
            val (base, ext) = (entry.substring(0, dot), entry.substring(dot))
            val content = new String(bytes, "UTF-8")
            val (t, a) = byBase.getOrElse(base, (None, None))
            ext match {
              case ".txt" => byBase(base) = (Some(content), a)
              case ".ann" => byBase(base) = (t, Some(content))
              case _      => // other payloads (conf, README) are not documents
            }
          }
        }
        byBase.toSeq.sortBy(_._1).collect {
          case (base, (Some(txt), ann)) => (base, txt, ann.getOrElse(""))
        }
      } finally in.close()
    }.toDS()
  }

  /** Archive corpus → annotated sentences, with the converter filters. */
  def loadArchives(
      spark: org.apache.spark.sql.SparkSession,
      pattern: String,
      entitiesFilter: Set[String] = Set.empty,
      relationsFilter: Set[String] = Set.empty,
      entitiesMapping: Map[String, String] = Map.empty,
      relationsMapping: Map[String, String] = Map.empty,
  ): org.apache.spark.sql.Dataset[AnnotatedSentence] = {
    import spark.implicits._
    archiveDocuments(spark, pattern).flatMap { case (_, txt, ann) =>
      val (es, rs) = parseAnn(ann)
      convertExample(Example(txt, es, rs),
        entitiesFilter, relationsFilter, entitiesMapping, relationsMapping)
    }
  }
}

package graft.nlp

import graft.SparkSpec
import graft.model.Forest
import org.scalatest.funsuite.AnyFunSuite

class PluginsSpec extends AnyFunSuite with SparkSpec {

  test("RegexEntityExtractor finds offset-anchored entities") {
    val ex = new RegexEntityExtractor(Seq("DRUG" -> "aspirin|ibuprofen", "DOSE" -> "\\d+mg"))
    val s = ex.extract("took aspirin 500mg then ibuprofen")
    assert(s.entities.map(e => (e.name, e.value)) ==
      Seq(("DRUG", "aspirin"), ("DOSE", "500mg"), ("DRUG", "ibuprofen")))
    val first = s.entities.head
    assert(s.txt.substring(first.start, first.end) == "aspirin")
  }

  test("enrich appends extractor entities to annotated sentences, distributed") {
    import spark.implicits._
    val base = Seq(AnnotatedSentence("dose is 500mg", Seq(Entity("X", 0, 4, "T1", "dose")), Seq.empty)).toDS()
    val enriched = new RegexEntityExtractor(Seq("DOSE" -> "\\d+mg")).enrich(base).head()
    assert(enriched.entities.map(_.name) == Seq("X", "DOSE"))
  }

  test("DictionaryEntityResolver canonicalizes values case-insensitively") {
    import spark.implicits._
    val resolver = new DictionaryEntityResolver(Map("asa" -> "aspirin"))
    val ds = Seq(AnnotatedSentence("ASA given", Seq(Entity("DRUG", 0, 3, "T1", "ASA")), Seq.empty)).toDS()
    assert(resolver.resolveSentences(ds).head().entities.head.value == "aspirin")
  }

  test("SentenceParser.parseBatch runs parse + processTree over a dataset") {
    import spark.implicits._
    val sentences = Seq(
      AnnotatedSentence("patient took aspirin", Seq(Entity("DRUG", 13, 20, "T1", "aspirin")), Seq.empty),
      AnnotatedSentence("no entities here", Seq.empty, Seq.empty)).toDS()
    val forest = new WhitespaceParser().parseBatch(sentences)
    val trees = Forest.collectTrees(forest)
    // the entity-less sentence degenerates and is dropped (reference
    // parser behavior); the annotated one carries its inserted entity
    assert(trees.size == 1)
    assert(trees.exists(_.render.contains("(ENT::DRUG aspirin)")))
  }

  test("plugged pipeline composes: extract, resolve, parse") {
    import spark.implicits._
    val raw = Seq("gave ASA today").toDS()
    val extractor = new RegexEntityExtractor(Seq("DRUG" -> "ASA"))
    val annotated = raw.map(extractor.extract _)
    val resolved = new DictionaryEntityResolver(Map("asa" -> "aspirin"))
      .resolveSentences(annotated)
    // the resolver canonicalizes the entity VALUE; the tree keeps the
    // surface tokens as leaves (the value rides as metadata, like the
    // reference's TreeEntity)
    assert(resolved.head().entities.head.value == "aspirin")
    val trees = Forest.collectTrees(new WhitespaceParser().parseBatch(resolved))
    assert(trees.size == 1)
    assert(trees.head.render.contains("(ENT::DRUG ASA)"))
  }
}

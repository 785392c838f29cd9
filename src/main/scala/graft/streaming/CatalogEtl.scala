package graft.streaming

import graft.ops.CatalogDocs
import org.apache.spark.sql.SparkSession

/** The reference's ETL loop over its OWN catalog schema (etl/main.py:357-385:
  * movies / genres / persons pipelines back to back, each with its own state
  * key) — the seed-parity counterpart of [[ReferenceEtl]], which re-expresses
  * the same tick over the TPC-H-shaped driver tables.
  *
  * The movies change feed is the reference's three disjunctive watermark
  * predicates (etl/main.py:35) folded into one (id, modified) stream; each
  * pipeline rebuilds FULL documents for dirty ids (the reference's
  * filter-before-group bug fixed, SURVEY T4) and advances its watermark only
  * after the sink commit. The seed's all-identical timestamps exercise the
  * T3 strictly-greater tie-break: tick 1 picks everything, tick 2 is a
  * clean zero, no starvation.
  */
class CatalogEtl(catalogDir: String, workDir: String) {

  val movies = new IncrementalDocPipeline(
    docBuilder = (s, ids) => CatalogDocs.movieDocs(s, catalogDir, Some(ids)),
    changes = CatalogDocs.movieChanges(catalogDir),
    storePath = s"$workDir/movies_store",
    statePath = s"$workDir/movies_state")

  val genres = new IncrementalDocPipeline(
    docBuilder = (s, ids) => CatalogDocs.genreDocs(s, catalogDir, Some(ids)),
    changes = CatalogDocs.genreChanges(catalogDir),
    storePath = s"$workDir/genres_store",
    statePath = s"$workDir/genres_state")

  val persons = new IncrementalDocPipeline(
    docBuilder = (s, ids) => CatalogDocs.personDocs(s, catalogDir, Some(ids)),
    changes = CatalogDocs.personChanges(catalogDir),
    storePath = s"$workDir/persons_store",
    statePath = s"$workDir/persons_state")

  /** One round, reference order (movies, genres, persons). */
  def tickAll(spark: SparkSession): Map[String, Long] = Map(
    "movies" -> movies.tick(spark),
    "genres" -> genres.tick(spark),
    "persons" -> persons.tick(spark))
}

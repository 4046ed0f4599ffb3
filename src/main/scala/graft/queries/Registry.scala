package graft.queries

/** All declared queries, in stable order. SparkEntry exposes exactly
  * this inventory to the driver's correctness and bench harnesses.
  */
object Registry {
  val all: Seq[Q] =
    VectorQueries.all ++
      RelationalQueries.all ++
      TextQueries.all ++
      EmbeddingQueries.all ++
      MultimodalQueries.all ++
      StreamingQueries.all ++
      ExtendedQueries.all ++
      BatteryQueries.all ++
      Round3Queries.all ++
      Round4Queries.all ++
      Round4bQueries.all ++
      Round5Queries.all ++
      Round5bQueries.all ++
      Round6Queries.all ++
      Round6bQueries.all ++
      Round6cQueries.all ++
      Round7Queries.all ++
      Round8Queries.all ++
      Round9Queries.all ++
      Round10Queries.all ++
      Round11Queries.all ++
      Round12Queries.all ++
      Round13Queries.all ++
      Round14Queries.all ++
      Round15Queries.all ++
      Round16Queries.all ++
      Round17Queries.all ++
      Round18Queries.all ++
      Round19Queries.all ++
      Round20Queries.all ++
      Round21Queries.all

  require(all.map(_.name).distinct.size == all.size,
    "duplicate query names in registry")
}

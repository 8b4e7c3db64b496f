package graft.queries

// Placeholder registries — filled in as each operator family lands.
object TextQueries   { val queries: Seq[GraftQuery] = Seq.empty }
object DedupQueries  { val queries: Seq[GraftQuery] = Seq.empty }
object VectorQueries { val queries: Seq[GraftQuery] = Seq.empty }

package graft.etl

import graft.query.Q

/** Query-pack surface for the ETL pipeline half (actions/transactions
  * modes over synthetic block fixtures). Filled in milestone M2/M4. */
object PipelineQueries {
  val all: Seq[Q] = Seq()
}

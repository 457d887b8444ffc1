package graft.core.rules

/** Recover tables from the text IR (F2 — semantics of
  * /root/reference/invoice_processor.py:672-701): split on
  * `--- TABLE i.j ---` markers; rows are lines containing " | ";
  * cells are trimmed. Tables → rows → cells.
  */
object TableParser {
  private val sectionSplit = "\\n-+\\s*TABLE\\s+\\d+\\.\\d+\\s*-+\\n".r

  def parse(text: String): List[List[List[String]]] = {
    val sections = sectionSplit.split(text).toList
    // when the split produced >1 section the first is pre-table prose and
    // is skipped; otherwise the whole text is scanned (reference :685)
    val candidates = if (sections.length > 1) sections.tail else sections
    candidates.flatMap { section =>
      val rows = section.trim.split("\n", -1).toList.collect {
        case line if line.contains(" | ") => line.split(" \\| ", -1).map(_.trim).toList
      }
      if (rows.nonEmpty) Some(rows) else None
    }
  }
}

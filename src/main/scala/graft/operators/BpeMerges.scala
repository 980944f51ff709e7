package graft.operators

/** Frozen trained BPE merge table — the tokenizer-training artifact,
  * checked in the way a production tokenizer ships its merges file.
  *
  * Provenance (fully deterministic, reproducible): `graft.jobs.BpeTrain
  * /root/testdata/sf0.01` — Bpe.train (k-round distributed pair counts,
  * (count DESC, left ASC, right ASC) argmax, left-to-right
  * non-overlapping merge application) over the sf0.01 `documents` table's
  * whitespace tokens, Rounds merges. The q88 driver query re-runs the
  * trainer and its DuckDB oracle is THESE constants as a VALUES table, so
  * parity pins the whole distributed loop engine-exactly; retraining =
  * rerun BpeTrain and refresh this file.
  */
object BpeMerges {
  val Rounds: Int = 16
  /** (rank, left, right, count) per trained merge, rank ascending. */
  val values: Seq[(Int, String, String, Long)] = Seq(
    (1, "e", "r", 4568L),
    (2, "i", "n", 2760L),
    (3, "o", "w", 2747L),
    (4, "o", "r", 2696L),
    (5, "s", "t", 2676L),
    (6, "m", "er", 1852L),
    (7, "a", "t", 1845L),
    (8, "l", "u", 1831L),
    (9, "a", "r", 1758L),
    (10, "p", "ar", 1758L),
    (11, "j", "o", 964L),
    (12, "jo", "in", 964L),
    (13, "a", "s", 947L),
    (14, "as", "h", 947L),
    (15, "h", "ash", 947L),
    (16, "r", "ow", 943L),
  )
}

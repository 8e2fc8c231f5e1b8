package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.{Dec, Tables}
import graft.operators.{Cohorts, Dedup, Diff, Drift, Joins, Multimodal, Packing, Profiling, Quantize, Retrieval, Rolling, Rules, Sampling, Scd, Scrub, SemiStructured, Similarity, Sketch, Skew, TextAnalysis, Trend}

/** EXT — the LLM-training-data-pipeline operators (SURVEY.md §2.11;
  * BASELINE.json north star) over the `documents` / `embeddings`
  * fixtures: dedup (exact, n-gram Jaccard, MinHash-LSH, SimHash),
  * embedding similarity (brute-force top-k, bucketed near-dup), text
  * analysis (language-ID, quality, token stats, fingerprints) and
  * multimodal column plumbing.
  *
  * Every query has a full DuckDB oracle — including MinHash-LSH and
  * SimHash, which are usually "unverifiable": the portable arithmetic
  * hashes in [[graft.functions.TextHash]] make the whole pipeline
  * reproducible bit-for-bit in any engine with list lambdas, so the
  * oracle replays signature building, banding, candidate generation and
  * verification and must land on the identical pair set.
  *
  * Oracle type discipline (learned from the driver's exact compare):
  * Spark `size`/`length`/`row_number`/`bit_count` are INT32 while
  * DuckDB's are INT64 — every such column is cast explicitly on the
  * DuckDB side; doubles come only from order-pinned folds or single
  * divisions of exact integers.
  */
object Ext extends ExtHelpers
    with ExtDedupQ with ExtMultimodalQ with ExtProfilingQ with ExtRelationalQ with ExtSamplingQ with ExtSimilarityQ with ExtSketchQ with ExtTemporalQ with ExtTextQ {

  def all: Seq[Q] =
    Seq(q16, q17, q18, q19, q20, q21, q22, q23, q24, q25, q26, q30, q31,
      q32, q33, q34, q35, q36, q37, q38, q39, q40, q41, q42, q43, q44,
      q45, q46, q47, q48, q49, q50, q51, q52, q53, q54, q55, q56, q57,
      q58, q59, q60, q61, q62, q63, q64, q65, q66, q67, q68, q69, q70,
      q71, q72, q73, q74, q75, q76, q77, q78, q79, q80, q81, q82, q83,
      q84, q85, q86, q87, q88, q89, q90, q91, q92, q93, q94, q95, q96,
      q97, q98, q99, q100, q101, q102, q103, q104, q105, q106, q107,
      q108, q109, q110, q111, q112, q113, q114, q115, q116, q117,
      q118, q119, q120, q121, q122, q123, q124, q125, q126, q127, q128,
      q129, q130, q131, q132, q133, q134, q135, q136, q137, q138,
      q139, q140, q141, q142, q143, q144, q145, q146, q147, q148,
      q149, q150, q151, q152, q153, q154, q155, q156, q157, q158,
      q159, q160, q161, q162, q163, q164, q165, q166, q167, q168,
      q169, q170, q171, q172, q173, q174, q175, q176, q177, q178, q179, q180,
      q181, q182, q183, q184, q185, q186, q187, q188, q189, q190,
      q191, q192, q193, q194, q195, q196, q197, q198, q199, q200, q201,
      q202, q203, q204, q205, q206, q207, q208, q209, q210,
      q211, q212, q213, q214, q215, q216, q217, q218, q219, q220,
      q221, q222, q223, q224, q225, q226, q227, q228, q229, q230,
      q231, q232, q233, q234, q235, q236, q237, q238, q239, q240,
      q241, q242, q243, q244, q245, q246, q247, q248, q249, q250, q251,
      q252, q253, q254, q255, q256, q257, q258, q259, q260, q261, q262,
      q263, q264, q265, q266, q267, q268, q269, q270, q271, q272, q273, q274, q275, q276, q277, q278, q279, q280, q281, q282, q283, q284, q285, q286, q287, q288, q289, q290, q291, q292, q293, q294, q295, q296, q297, q298, q299, q300, q301, q302, q303, q304, q305, q306, q307, q308, q309, q310, q311, q312, q313, q314, q315,
      q316)
}


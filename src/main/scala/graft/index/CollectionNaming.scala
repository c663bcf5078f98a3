package graft.index

/**
 * Collection naming (SURVEY §1.3): the reference encodes
 * dataset + model + normalization into the collection name —
 * `{dataset}_{model_basename}_not-normalized` (`/root/reference/main.py:28-34`).
 * Due to a Python ternary-precedence bug the reference's name collapses to
 * just "normalized" when the flag is set; we keep the INTENT (all three
 * knobs in the name) with correct logic.
 */
object CollectionNaming {

  /** F4: model basename = last path segment of a registry id like
    * `jinaai/jina-embeddings-v2-small-en` (`main.py:28`). */
  def modelBasename(model: String): String = model.split('/').last

  def collectionName(dataset: String, model: String, normalized: Boolean): String = {
    val norm = if (normalized) "normalized" else "not-normalized"
    s"${dataset}_${modelBasename(model)}_$norm"
  }
}

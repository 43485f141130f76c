package graft.rake

/** English stopword set for RAKE phrase segmentation.
  *
  * The reference loads the SMART stoplist from a bundled text file
  * (`rake/stopwords.rs:53-64`, 572 words, `#` comments skipped,
  * lowercased). This engine embeds a standard English function-word set
  * covering the same role: determiners, pronouns, prepositions,
  * conjunctions, auxiliaries, and common adverbs/quantifiers. In Spark
  * the set is a per-executor JVM singleton (the moral equivalent of a
  * broadcast variable for a constant this small); a custom list can be
  * supplied per call for domain-specific corpora.
  */
object Stopwords {
  val english: Set[String] = Set(
    "a", "about", "above", "after", "again", "against", "all", "almost",
    "alone", "along", "already", "also", "although", "always", "am",
    "among", "an", "and", "another", "any", "anybody", "anyone",
    "anything", "anywhere", "are", "area", "around", "as", "ask", "asked",
    "at", "away", "back", "be", "became", "because", "become", "becomes",
    "been", "before", "began", "behind", "being", "best", "better",
    "between", "both", "but", "by", "came", "can", "cannot", "case",
    "certain", "certainly", "clear", "clearly", "come", "could", "did",
    "differ", "different", "do", "does", "done", "down", "during", "each",
    "early", "either", "else", "end", "enough", "even", "ever", "every",
    "everybody", "everyone", "everything", "everywhere", "far", "few",
    "find", "finds", "first", "for", "four", "from", "full", "fully",
    "further", "gave", "general", "generally", "get", "gets", "give",
    "given", "gives", "go", "going", "good", "got", "great", "had", "has",
    "have", "having", "he", "her", "here", "herself", "high", "higher",
    "him", "himself", "his", "how", "however", "i", "if", "important",
    "in", "interest", "into", "is", "it", "its", "itself", "just", "keep",
    "keeps", "kind", "knew", "know", "known", "knows", "large", "largely",
    "last", "later", "latest", "least", "less", "let", "lets", "like",
    "likely", "long", "longer", "made", "make", "making", "man", "many",
    "may", "me", "member", "men", "might", "more", "most", "mostly", "mr",
    "mrs", "much", "must", "my", "myself", "necessary", "need", "needed",
    "needs", "never", "new", "newer", "newest", "next", "no", "nobody",
    "non", "noone", "not", "nothing", "now", "nowhere", "number", "of",
    "off", "often", "old", "older", "oldest", "on", "once", "one", "only",
    "open", "opened", "opens", "or", "order", "ordered", "other",
    "others", "our", "out", "over", "own", "part", "parted", "parts",
    "per", "perhaps", "place", "places", "point", "pointed", "points",
    "possible", "present", "presented", "presents", "problem", "problems",
    "put", "puts", "quite", "rather", "really", "right", "room", "said",
    "same", "saw", "say", "says", "second", "see", "seem", "seemed",
    "seems", "sees", "several", "shall", "she", "should", "show",
    "showed", "shows", "side", "since", "small", "smaller", "smallest",
    "so", "some", "somebody", "someone", "something", "somewhere",
    "state", "states", "still", "such", "sure", "take", "taken", "than",
    "that", "the", "their", "them", "then", "there", "therefore", "these",
    "they", "thing", "things", "think", "thinks", "this", "those",
    "though", "thought", "thoughts", "three", "through", "thus", "to",
    "today", "together", "too", "took", "toward", "turn", "turned",
    "turns", "two", "under", "until", "up", "upon", "us", "use", "used",
    "uses", "very", "want", "wanted", "wants", "was", "way", "ways", "we",
    "well", "went", "were", "what", "when", "where", "whether", "which",
    "while", "who", "whole", "whose", "why", "will", "with", "within",
    "without", "work", "worked", "works", "would", "year", "years", "yet",
    "you", "young", "younger", "youngest", "your", "yours")
}

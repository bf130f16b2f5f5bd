package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-classification predicates, as boolean column expressions.
 *
 * Semantics follow `/root/reference/unstructured/partition/text_type.py` and the regexes in
 * `/root/reference/unstructured/nlp/patterns.py`. The reference's NLTK-based helpers
 * (`sent_tokenize`, `word_tokenize`, `pos_tag`) are re-expressed as deterministic
 * regex/arithmetic expressions: a sentence boundary is `[.!?]+` followed by whitespace, a
 * word token is a maximal run of letters, and the verb check is a suffix + wordlist
 * heuristic. This keeps every predicate pure-SQL (codegen'd, shuffle-free) and
 * deterministic across retries.
 */
object Predicates {

  /** `US_PHONE_NUMBERS_PATTERN` — `patterns.py:7-9`. The trailing `\s*$` uses
    * Python semantics: unicode whitespace before `$`, and `$` recognizing only
    * `\n` as a line terminator (Java's default `$` also stops before NEL/LS/PS,
    * hence the `(?d)` UNIX_LINES flag). */
  val UsPhonePattern =
    "(?d)(?:\\+?(\\d{1,3}))?[-. (]*(\\d{3})?[-. )]*(\\d{3})[-. ]*(\\d{4})(?: *x(\\d+))?" +
      Cleaners.PySpaceClass + "*$"

  /** `EMAIL_ADDRESS_PATTERN` — `patterns.py:107`. */
  val EmailAddressPattern = "[a-z0-9\\.\\-+_]+@[a-z0-9\\.\\-+_]+\\.[a-z]+"

  /** `NUMBERED_LIST_PATTERN` — `patterns.py:142`. */
  val NumberedListPattern = "^\\d+(\\.|\\))\\s(.+)"

  /** `US_CITY_STATE_ZIP_PATTERN` — `patterns.py:15-26` (verbatim alternation). */
  val UsCityStateZipPattern: String =
    "(?i)\\b(?:[A-Z][a-z.-]{1,15}[ ]?){1,5},\\s?" +
      "(?:\\{Alabama|Alaska|Arizona|Arkansas|California|Colorado|Connecticut|Delaware|Florida" +
      "|Georgia|Hawaii|Idaho|Illinois|Indiana|Iowa|Kansas|Kentucky|Louisiana|Maine|Maryland" +
      "|Massachusetts|Michigan|Minnesota|Mississippi|Missouri|Montana|Nebraska|Nevada|" +
      "New[ ]Hampshire|New[ ]Jersey|New[ ]Mexico|New[ ]York|North[ ]Carolina|North[ ]Dakota" +
      "|Ohio|Oklahoma|Oregon|Pennsylvania|Rhode[ ]Island|South[ ]Carolina|South[ ]Dakota" +
      "|Tennessee|Texas|Utah|Vermont|Virginia|Washington|West[ ]Virginia|Wisconsin|Wyoming\\}" +
      "|\\{AL|AK|AS|AZ|AR|CA|CO|CT|DE|DC|FM|FL|GA|GU|HI|ID|IL|IN|IA|KS|KY|LA|ME|MH|MD|MA|MI|MN" +
      "|MS|MO|MT|NE|NV|NH|NJ|NM|NY|NC|ND|MP|OH|OK|OR|PW|PA|PR|RI|SC|SD|TN|TX|UT|VT|VI|VA|" +
      "WA|WV|WI|WY\\})(, |\\s)?(?:\\b\\d{5}(?:-\\d{4})?\\b)"

  /** `ENDS_IN_PUNCT_PATTERN` — `patterns.py:110`. */
  val EndsInPunctPattern = "[^\\w\\s]$"

  import Cleaners.pyStrip

  /** Python `str.isupper()`: at least one cased char, no lowercase cased chars. */
  def isUpperText(c: Column): Column = (upper(c) === c) && (lower(c) =!= c)

  /** Python `str.isnumeric()` (ASCII approximation): non-empty, all digits. */
  def isNumericText(c: Column): Column = regexp_like(c, lit("^[0-9]+$"))

  /** `is_bulleted_text` — `text_type.py:165-167`. */
  def isBulletedText(c: Column): Column =
    regexp_like(pyStrip(c), lit("^" + Cleaners.UnicodeBulletsRegex))

  /** `is_email_address` — `text_type.py:318-320` (anchored match on stripped
    * text). The `contains("@")` prefilter is a necessary condition of the
    * pattern (it demands a literal `@` after the local part): an anchored
    * regex fails fast on a non-matching FIRST char, but a paragraph starting
    * with address-class chars scans its whole leading run before failing at
    * the missing `@` — the guard skips that scan for ~every paragraph. */
  def isEmailAddress(c: Column): Column =
    c.contains("@") && regexp_like(pyStrip(c), lit("^" + EmailAddressPattern))

  /** `is_us_city_state_zip` — `text_type.py:306-315`. `contains(",")` is a
    * necessary condition (the pattern demands the comma after the city
    * words) — it skips the big state-alternation regex on comma-less text. */
  def isUsCityStateZip(c: Column): Column =
    c.contains(",") && regexp_like(pyStrip(c), lit("^(?:" + UsCityStateZipPattern + ")"))

  /** `is_possible_numbered_list` — `text_type.py:323-325`. */
  def isPossibleNumberedList(c: Column): Column =
    regexp_like(pyStrip(c), lit(NumberedListPattern))

  /** `contains_us_phone_number` — `text_type.py:170-177` (search, not match). */
  def containsUsPhoneNumber(c: Column): Column =
    regexp_like(pyStrip(c), lit(UsPhonePattern))

  /**
   * `sentence_count` — `text_type.py:208-238`. Sentences = maximal segments matching
   * `[^.!?]+[.!?]+` plus a trailing unterminated segment — the IDENTICAL extraction
   * pattern the DuckDB oracle uses (`OracleSql.sentences`), so the two engines agree on
   * every input, including periods not followed by whitespace ("3.14", "e.g.").
   * With `minLength`, a sentence only counts when it has at least that many word tokens
   * after punctuation removal.
   */
  def sentenceCount(c: Column, minLength: Int = 0): Column = {
    val sentences = filter(
      regexp_extract_all(pyStrip(c), lit("[^.!?]+[.!?]+|[^.!?]+$"), lit(0)),
      s => pyStrip(s) =!= "")
    if (minLength <= 0) size(sentences)
    else
      size(filter(sentences, s =>
        size(filter(split(Cleaners.removePunctuation(s), "\\s+"),
          w => w =!= "" && w =!= ".")) >= minLength))
  }

  /**
   * `under_non_alpha_ratio` — `text_type.py:241-265`: true when, over non-space chars,
   * the alpha fraction is below `threshold`.
   */
  def underNonAlphaRatio(c: Column, threshold: Double = 0.5): Column = {
    val total = length(regexp_replace(c, "\\s", ""))
    val alpha = length(regexp_replace(c, "[^\\p{L}]", ""))
    when(total > 0, alpha.cast("double") / total.cast("double") < threshold)
      .otherwise(lit(false))
  }

  /**
   * `exceeds_cap_ratio` — `text_type.py:268-303`: multi-sentence text never exceeds;
   * all-caps always does; otherwise the fraction of capitalized alpha tokens must
   * exceed `threshold` (empty token list counts as exceeding).
   */
  def exceedsCapRatio(c: Column, threshold: Double = 0.5): Column =
    when(sentenceCount(c, 3) > 1, lit(false))
      .otherwise(exceedsCapRatioSingleSentence(c, threshold))

  /** [[exceedsCapRatio]] under the already-established premise
    * `sentenceCount(c, 3) <= 1` — the capitalization-fraction half without
    * the multi-sentence gate, so callers that branch on the sentence count
    * themselves (the narrative cascade) evaluate it exactly once. */
  private def exceedsCapRatioSingleSentence(c: Column,
      threshold: Double): Column = {
    val tokens = filter(split(c, "[^\\p{L}]+"), w => w =!= "")
    // `word.istitle() or word.isupper()` — Unicode-aware like Python's
    val capped = filter(tokens,
      w => regexp_like(w, lit("^\\p{Lu}\\p{Ll}*$|^\\p{Lu}+$")))
    when(isUpperText(c), lit(true))
      .when(size(tokens) === 0, lit(true))
      .otherwise(size(capped).cast("double") / size(tokens).cast("double") > threshold)
  }

  /**
   * Verb heuristic standing in for the reference's POS-tag check
   * (`contains_verb`, `text_type.py:180-187`): a token in a small closed verb list or a
   * token with a clearly verbal suffix.
   */
  val CommonVerbs: Seq[String] = Seq(
    "is", "are", "was", "were", "be", "been", "being", "am",
    "has", "have", "had", "do", "does", "did", "will", "would",
    "can", "could", "shall", "should", "may", "might", "must",
    "go", "goes", "went", "get", "gets", "got", "make", "makes",
    "made", "see", "sees", "saw", "run", "runs", "ran", "contains",
    "met", "walk", "walking", "said", "says",
    // common imperative/plain forms the tagger flags as VB/VBP
    "ask", "asks", "look", "looks", "take", "takes", "took",
    "give", "gives", "gave", "tell", "tells", "told", "know", "knows",
    "knew", "think", "thinks", "find", "finds", "come", "comes", "came",
    "want", "wants", "use", "uses", "put", "puts", "call", "calls",
    "keep", "keeps", "kept", "let", "lets", "begin", "begins", "began",
    "show", "shows", "hear", "hears", "heard", "play", "plays",
    "move", "moves", "bring", "brings", "brought", "write", "writes",
    "wrote", "read", "reads", "sit", "sits", "sat", "stand", "stands",
    "stood", "lose", "loses", "lost", "pay", "pays", "paid", "meet",
    "meets", "set", "sets", "learn", "learns", "lead", "leads", "led",
    "happen", "happens", "become", "becomes", "became", "seem", "seems")

  def containsVerb(c: Column): Column = {
    val words = split(lower(c), "[^a-z]+")
    val inList = size(array_intersect(words, lit(CommonVerbs.toArray))) > 0
    val suffix = exists(words, w => regexp_like(w, lit("^[a-z]{3,}(ing|ed)$")))
    inList || suffix
  }

  /**
   * `contains_english_word` — `text_type.py:191-205`: the lowercased text splits
   * on `ENGLISH_WORD_SPLIT_RE` (`[\s\-,.!?_/]+`), every remaining non-`[a-z]`
   * char is dropped from each token (`"beggar's"` → `beggars`), and any stripped
   * token of length > 1 present in the English wordlist qualifies. The reference
   * loads a ~25k-word
   * list from a data file (`nlp/english_words.py` — the `english-words.txt`
   * payload is absent from this checkout, so it cannot be reproduced verbatim);
   * this lexicon is the union of a derived list and a curated head:
   *
   *  - `graft/english-words.txt` (~11.5k words): the full qualifying vocabulary
   *    of the English text that IS in the checkout — the reference's own
   *    public-domain test corpus (book-war-and-peace-1225p.txt + the English
   *    .txt/.html example docs), regenerable via `dev/gen_english_words.py`
   *    (deterministic filters; tokens only ever seen capitalized are dropped to
   *    exclude proper nouns). Like the reference's nltk-based list it carries a
   *    residue of off-register entries (archaic forms, the novel's French
   *    passages) — harmless for a contains-ANY-English heuristic;
   *  - [[CuratedEnglishWords]] (~1.3k): high-frequency + technical vocabulary
   *    the 19th-century corpus lacks ("cache", "email", "software").
   *
   * Membership runs as a native expression probing one shared static hash set —
   * O(tokens) per row regardless of lexicon size ([[expr.ContainsEnglishWord]]);
   * `arrays_overlap` against a 11.5k-element literal would probe the whole
   * lexicon per row. Callers with their own `words` keep the literal-array path.
   */
  lazy val EnglishWords: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/english-words.txt")
    val derived =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toVector
      finally in.close()
    (derived ++ CuratedEnglishWords).distinct.sorted
  }

  private[graft] val CuratedEnglishWords: Seq[String] = Seq(
    // function words / pronouns / determiners
    "the", "and", "for", "that", "this", "with", "from", "have", "has", "had",
    "not", "but", "you", "all", "can", "her", "was", "one", "our", "out",
    "are", "his", "they", "she", "will", "there", "their", "what", "when",
    "which", "who", "whom", "whose", "how", "were", "been", "more", "some",
    "than", "then", "them", "these", "those", "two", "three", "four", "five",
    "six", "seven", "eight", "nine", "ten", "may", "might", "must", "shall",
    "should", "would", "could", "first", "second", "third", "last", "next",
    "any", "its", "only", "other", "another", "each", "every", "either",
    "neither", "both", "few", "many", "much", "most", "several", "such",
    "own", "same", "very", "too", "also", "just", "even", "still", "yet",
    "again", "once", "twice", "here", "where", "why", "because", "since",
    "until", "while", "although", "though", "unless", "whether", "about",
    "above", "across", "after", "against", "along", "among", "around",
    "before", "behind", "below", "beneath", "beside", "between", "beyond",
    "during", "except", "inside", "into", "near", "off", "onto", "over",
    "past", "through", "toward", "towards", "under", "upon", "within",
    "without", "nor", "nothing", "something", "anything", "everything",
    "someone", "anyone", "everyone", "nobody", "somebody", "anybody",
    "everybody", "himself", "herself", "itself", "themselves", "myself",
    "yourself", "ourselves",
    // common verbs (base + inflected)
    "be", "is", "am", "being", "do", "does", "did", "doing", "done", "go",
    "goes", "went", "going", "gone", "get", "gets", "got", "getting", "make",
    "makes", "made", "making", "know", "knows", "knew", "known", "knowing",
    "think", "thinks", "thought", "thinking", "take", "takes", "took", "taken",
    "taking", "see", "sees", "saw", "seen", "seeing", "come", "comes", "came",
    "coming", "want", "wants", "wanted", "wanting", "look", "looks", "looked",
    "looking", "use", "uses", "used", "using", "find", "finds", "found",
    "finding", "give", "gives", "gave", "given", "giving", "tell", "tells",
    "told", "telling", "work", "works", "worked", "working", "call", "calls",
    "called", "calling", "try", "tries", "tried", "trying", "ask", "asks",
    "asked", "asking", "need", "needs", "needed", "needing", "feel", "feels",
    "felt", "feeling", "become", "becomes", "became", "becoming", "leave",
    "leaves", "left", "leaving", "put", "puts", "putting", "mean", "means",
    "meant", "meaning", "keep", "keeps", "kept", "keeping", "let", "lets",
    "letting", "begin", "begins", "began", "begun", "beginning", "seem",
    "seems", "seemed", "seeming", "help", "helps", "helped", "helping",
    "talk", "talks", "talked", "talking", "turn", "turns", "turned",
    "turning", "start", "starts", "started", "starting", "show", "shows",
    "showed", "shown", "showing", "hear", "hears", "heard", "hearing",
    "play", "plays", "played", "playing", "run", "runs", "ran", "running",
    "move", "moves", "moved", "moving", "like", "likes", "liked", "liking",
    "live", "lives", "lived", "living", "believe", "believes", "believed",
    "hold", "holds", "held", "holding", "bring", "brings", "brought",
    "bringing", "happen", "happens", "happened", "happening", "write",
    "writes", "wrote", "written", "writing", "provide", "provides",
    "provided", "providing", "sit", "sits", "sat", "sitting", "stand",
    "stands", "stood", "standing", "lose", "loses", "lost", "losing", "pay",
    "pays", "paid", "paying", "meet", "meets", "met", "meeting", "include",
    "includes", "included", "including", "continue", "continues",
    "continued", "continuing", "set", "sets", "setting", "learn", "learns",
    "learned", "learning", "change", "changes", "changed", "changing",
    "lead", "leads", "leading", "understand", "understands", "understood",
    "watch", "watches", "watched", "watching", "follow", "follows",
    "followed", "following", "stop", "stops", "stopped", "stopping",
    "create", "creates", "created", "creating", "speak", "speaks", "spoke",
    "spoken", "speaking", "read", "reads", "reading", "allow", "allows",
    "allowed", "allowing", "add", "adds", "added", "adding", "spend",
    "spends", "spent", "spending", "grow", "grows", "grew", "grown",
    "growing", "open", "opens", "opened", "opening", "walk", "walks",
    "walked", "walking", "win", "wins", "won", "winning", "offer", "offers",
    "offered", "offering", "remember", "remembers", "remembered", "love",
    "loves", "loved", "loving", "consider", "considers", "considered",
    "appear", "appears", "appeared", "buy", "buys", "bought", "buying",
    "wait", "waits", "waited", "waiting", "serve", "serves", "served",
    "serving", "die", "dies", "died", "dying", "send", "sends", "sent",
    "sending", "expect", "expects", "expected", "build", "builds", "built",
    "building", "stay", "stays", "stayed", "staying", "fall", "falls",
    "fell", "fallen", "falling", "cut", "cuts", "cutting", "reach",
    "reaches", "reached", "reaching", "kill", "kills", "killed", "remain",
    "remains", "remained", "suggest", "suggests", "suggested", "raise",
    "raises", "raised", "pass", "passes", "passed", "passing", "sell",
    "sells", "sold", "selling", "require", "requires", "required", "report",
    "reports", "reported", "decide", "decides", "decided", "pull", "pulls",
    "pulled", "return", "returns", "returned", "explain", "explains",
    "explained", "hope", "hopes", "hoped", "develop", "develops",
    "developed", "carry", "carries", "carried", "break", "breaks", "broke",
    "broken", "receive", "receives", "received", "agree", "agrees",
    "agreed", "support", "supports", "supported", "hit", "hits", "hitting",
    "produce", "produces", "produced", "eat", "eats", "ate", "eaten",
    "eating", "cover", "covers", "covered", "catch", "catches", "caught",
    "draw", "draws", "drew", "drawn", "choose", "chooses", "chose",
    "chosen", "wear", "wears", "wore", "worn", "fight", "fights", "fought",
    "throw", "throws", "threw", "thrown", "fill", "fills", "filled",
    "drop", "drops", "dropped", "push", "pushes", "pushed", "check",
    "checks", "checked", "checking", "test", "tests", "tested", "testing",
    // common nouns
    "time", "year", "years", "people", "way", "ways", "day", "days", "man",
    "men", "woman", "women", "child", "children", "world", "life", "hand",
    "hands", "eye", "eyes", "place", "places", "week", "weeks", "case",
    "cases", "point", "points", "government", "company", "companies",
    "number", "numbers", "group", "groups", "problem", "problems", "fact",
    "facts", "money", "month", "months", "lot", "right", "study", "studies",
    "book", "books", "word", "words", "business", "issue", "issues", "side",
    "kind", "head", "house", "houses", "service", "services", "friend",
    "friends", "father", "mother", "power", "hour", "hours", "game",
    "games", "end", "member", "members", "law", "laws", "car", "cars",
    "city", "cities", "community", "name", "names", "president", "team",
    "teams", "minute", "minutes", "idea", "ideas", "kid", "kids", "body",
    "information", "back", "parent", "parents", "face", "others", "level",
    "levels", "office", "door", "doors", "health", "person", "art", "war",
    "history", "party", "parties", "result", "results", "morning", "reason",
    "reasons", "research", "girl", "girls", "guy", "guys", "moment", "air",
    "teacher", "teachers", "force", "education", "foot", "feet", "boy",
    "boys", "age", "ages", "policy", "process", "music", "market",
    "markets", "sense", "nation", "plan", "plans", "college", "interest",
    "death", "experience", "effect", "effects", "class", "classes",
    "control", "care", "field", "fields", "development", "role", "roles",
    "student", "students", "effort", "efforts", "rate", "rates", "heart",
    "drug", "drugs", "show", "leader", "leaders", "light", "voice", "wife",
    "police", "mind", "price", "prices", "report", "decision", "decisions",
    "son", "view", "views", "relationship", "town", "road", "roads", "arm",
    "arms", "difference", "value", "values", "building", "buildings",
    "action", "actions", "model", "models", "season", "society", "tax",
    "taxes", "director", "position", "positions", "player", "players",
    "record", "records", "paper", "papers", "space", "ground", "form",
    "forms", "event", "events", "official", "officials", "matter", "center",
    "couple", "site", "sites", "project", "projects", "activity",
    "activities", "star", "stars", "table", "tables", "need", "needs",
    "court", "courts", "oil", "situation", "cost", "costs", "industry",
    "figure", "figures", "street", "streets", "image", "images", "phone",
    "phones", "data", "picture", "pictures", "practice", "piece", "pieces",
    "land", "product", "products", "doctor", "doctors", "wall", "walls",
    "patient", "patients", "worker", "workers", "news", "test", "movie",
    "movies", "north", "south", "east", "west", "love", "support",
    "technology", "water", "fire", "food", "earth", "school", "schools",
    "country", "countries", "state", "states", "family", "families",
    "system", "systems", "program", "programs", "question", "questions",
    "work", "night", "nights", "home", "homes", "room", "rooms", "mother",
    "area", "areas", "story", "stories", "month", "line", "lines",
    "letter", "letters", "page", "pages", "answer", "answers", "computer",
    "computers", "language", "languages", "science", "window", "windows",
    "tree", "trees", "river", "rivers", "mountain", "mountains", "animal",
    "animals", "bird", "birds", "fish", "horse", "horses", "dog", "dogs",
    "parrot", "parrots", "beak", "beaks", "sheep", "goat", "goats",
    "cat", "cats", "sun", "moon", "sky", "sea", "rain", "snow", "wind",
    "summer", "winter", "spring", "autumn", "color", "colors", "sound",
    "sounds", "machine", "machines", "engine", "engines", "train",
    "trains", "plane", "planes", "ship", "ships", "bridge", "bridges",
    // common adjectives / adverbs
    "good", "better", "best", "bad", "worse", "worst", "great", "little",
    "old", "older", "oldest", "young", "younger", "youngest", "new",
    "newer", "newest", "long", "longer", "longest", "short", "shorter",
    "high", "higher", "highest", "low", "lower", "lowest", "big", "bigger",
    "biggest", "small", "smaller", "smallest", "large", "larger",
    "largest", "early", "earlier", "late", "later", "latest", "important",
    "public", "able", "different", "possible", "certain", "clear", "easy",
    "easier", "hard", "harder", "strong", "stronger", "free", "full",
    "true", "false", "whole", "real", "sure", "open", "close", "closed",
    "human", "local", "social", "national", "international", "political",
    "economic", "personal", "special", "general", "common", "simple",
    "single", "available", "likely", "recent", "current", "major", "minor",
    "final", "main", "similar", "various", "entire", "medical", "legal",
    "financial", "military", "religious", "natural", "physical", "serious",
    "ready", "happy", "sad", "angry", "afraid", "alone", "together",
    "quickly", "slowly", "fast", "slow", "well", "really", "actually",
    "probably", "perhaps", "maybe", "always", "never", "often", "sometimes",
    "usually", "rarely", "already", "almost", "quite", "rather", "enough",
    "especially", "particularly", "certainly", "clearly", "simply",
    "finally", "recently", "currently", "directly", "exactly", "nearly",
    "generally", "far", "away", "ago", "today", "tomorrow", "yesterday",
    "now", "soon", "ever", "however", "therefore", "instead", "otherwise",
    "meanwhile", "moreover", "indeed", "white", "black", "red", "green",
    "blue", "yellow", "brown", "dark", "bright", "heavy", "light", "deep",
    "wide", "narrow", "thick", "thin", "warm", "cold", "hot", "cool",
    "dry", "wet", "clean", "dirty", "quiet", "loud", "rich", "poor",
    "safe", "dangerous", "beautiful", "nice", "fine", "wonderful",
    "terrible", "amazing", "interesting", "boring", "useful", "useless",
    // domain vocabulary the synthetic corpus uses
    "order", "part", "key", "row", "join", "sort", "merge", "filter",
    "query", "batch", "stream", "hash", "scan", "column", "columns",
    "vector", "customer", "customers", "supplier", "suppliers", "region",
    "regions", "account", "accounts", "package", "packages", "request",
    "requests", "deposit", "deposits", "instruction", "instructions",
    "document", "documents", "element", "elements", "text", "title",
    "section", "sections", "chapter", "chapters", "paragraph", "paragraphs",
    "sentence", "sentences", "item", "items", "list", "lists", "type",
    "types", "source", "sources", "target", "targets", "file", "files",
    "folder", "folders", "user", "users", "server", "servers", "network",
    "networks", "code", "codes", "version", "versions", "update", "updates",
    "message", "messages", "email", "address", "addresses", "total",
    "totals", "amount", "amounts", "quantity", "quantities", "status",
    "date", "dates", "size", "sizes", "width", "height", "length", "depth",
    "weight", "speed", "limit", "limits", "range", "ranges", "average",
    "maximum", "minimum", "count", "counts", "index", "indexes", "node",
    "nodes", "edge", "edges", "graph", "graphs", "path", "paths", "map",
    "maps", "store", "stores", "cache", "disk", "memory", "thread",
    "threads", "task", "tasks", "job", "jobs", "step", "steps", "stage",
    "stages", "phase", "phases", "input", "inputs", "output", "outputs"
  ).distinct

  /** `ENGLISH_WORD_SPLIT_RE` (`text_type.py:24`) as a Java regex. */
  val EnglishWordSplitPattern = "[\\s\\u00a0\\u0085\\-,.!?_/]+"

  def containsEnglishWord(c: Column, words: Seq[String] = EnglishWords): Column =
    if (words eq EnglishWords)
      graft.functions.expr.Exprs.containsEnglishWord(c)
    else
      arrays_overlap(
        filter(
          transform(split(lower(c), EnglishWordSplitPattern),
            t => regexp_replace(t, "[^a-z]", "")),
          w => length(w) > 1),
        lit(words.toArray))

  /**
   * `is_possible_narrative_text` — `text_type.py:27-88` (default thresholds, no
   * language-specific checks): non-empty, not numeric, cap-ratio and non-alpha-ratio in
   * bounds, and at least 2 sentences or a verb.
   */
  def isPossibleNarrativeText(c: Column, capThreshold: Double = 0.5,
      nonAlphaThreshold: Double = 0.5, languageChecks: Boolean = false,
      languages: Seq[String] = Seq("eng")): Column = {
    // both the vocabulary gate and the sentence/verb gate apply only when
    // "eng" is among the document languages (`text_type.py:66,83`)
    val eng = languages.contains("eng")
    val base = (length(c) > 0) &&
      !isNumericText(c) &&
      (if (languageChecks && eng) containsEnglishWord(c) else lit(true))
    if (!eng)
      base && !exceedsCapRatio(c, capThreshold) &&
        !underNonAlphaRatio(c, nonAlphaThreshold)
    else
      // one sentenceCount evaluation instead of two: the cap-ratio gate
      // (`sentenceCount > 1` → never exceeds) and the sentence/verb gate
      // (`sentenceCount >= 2` → no verb needed) test the SAME predicate, so
      // branch on it once — sentence splitting is the cascade's most
      // expensive piece and CaseWhen branches get no common-subexpression
      // elimination. Expansion of the original conjunction:
      //   sc >= 2: capRatio = false, sentence gate = true → just the
      //            non-alpha bound;
      //   sc <= 1: cap ratio's single-sentence half + non-alpha + verb.
      base && when(sentenceCount(c, 3) >= 2,
          !underNonAlphaRatio(c, nonAlphaThreshold))
        .otherwise(!exceedsCapRatioSingleSentence(c, capThreshold) &&
          !underNonAlphaRatio(c, nonAlphaThreshold) && containsVerb(c))
  }

  /**
   * `is_possible_title` — `text_type.py:91-162` (default thresholds): non-empty, not
   * (all-caps and punct-terminated), at most 12 space-words, alpha-ratio in bounds, no
   * trailing comma, not numeric, at most one (>=5-word) sentence.
   */
  def isPossibleTitle(c: Column, sentenceMinLength: Int = 5,
      titleMaxWordLength: Int = 12, nonAlphaThreshold: Double = 0.5,
      languageChecks: Boolean = false,
      languages: Seq[String] = Seq("eng")): Column =
    (length(c) > 0) &&
      !(isUpperText(c) && regexp_like(c, lit(EndsInPunctPattern))) &&
      (size(split(c, " ")) <= titleMaxWordLength) &&
      !underNonAlphaRatio(c, nonAlphaThreshold) &&
      !c.endsWith(",") &&
      (if (languageChecks && languages.contains("eng")) containsEnglishWord(c)
       else lit(true)) &&
      !isNumericText(c) &&
      (sentenceCount(c, sentenceMinLength) <= 1)

  /**
   * The element-type classification cascade — `partition/text.py:111-166`, first match
   * wins, in the reference's normative order: bullet, email, US city/state/zip,
   * numbered list, narrative, title, fallback UncategorizedText.
   * (Positional header/footer checks apply only when coordinates exist —
   * [[classifyTextPositional]].)
   */
  def classifyText(c: Column): Column =
    when(pyStrip(c) === "", "UncategorizedText")
      .when(isBulletedText(c), "ListItem")
      .when(isEmailAddress(c), "EmailAddress")
      .when(isUsCityStateZip(c), "Address")
      .when(isPossibleNumberedList(c), "ListItem")
      .when(isPossibleNarrativeText(c), "NarrativeText")
      .when(isPossibleTitle(c), "Title")
      .otherwise("UncategorizedText")

  /**
   * `element_from_text` with coordinates — the positional branches come FIRST in the
   * cascade (`partition/text.py:111-127`): mean point y as a fraction of the layout
   * height below 0.07 classifies Header, above 0.93 Footer
   * (`_is_in_header_position`/`_is_in_footer_position`, `text.py:174-211`); rows
   * without coordinates fall through to the text cascade.
   */
  def classifyTextPositional(c: Column, avgY: Column, layoutHeight: Column): Column = {
    val pct = avgY / layoutHeight
    when(avgY.isNotNull && layoutHeight.isNotNull && pct < 0.07, "Header")
      .when(avgY.isNotNull && layoutHeight.isNotNull && pct > 0.93, "Footer")
      .otherwise(classifyText(c))
  }
}

package graft.core

/** HTML character-reference decoding.
  *
  * Behavioral spec: the reference pipeline decodes entities with
  * .NET `HttpUtility.HtmlDecode` after whitespace normalization
  * (/root/reference/Source/WebCrawler/Common/HtmlHelper.cs:237 and
  * Analyzers/Html2Article.cs:370). This is a from-scratch JVM
  * implementation of the same observable behavior for the HTML4
  * named set plus numeric (decimal & hex) references; unknown or
  * unterminated references pass through verbatim, as HtmlDecode does.
  */
object HtmlEntities {

  // HTML4 named entities (the set .NET HttpUtility resolves), plus the
  // XML apos. Key = name without '&' ';'.
  private val named: Map[String, String] = Map(
    "quot" -> "\"", "amp" -> "&", "apos" -> "'", "lt" -> "<", "gt" -> ">",
    "nbsp" -> " ", "iexcl" -> "¡", "cent" -> "¢",
    "pound" -> "£", "curren" -> "¤", "yen" -> "¥",
    "brvbar" -> "¦", "sect" -> "§", "uml" -> "¨",
    "copy" -> "©", "ordf" -> "ª", "laquo" -> "«",
    "not" -> "¬", "shy" -> "­", "reg" -> "®",
    "macr" -> "¯", "deg" -> "°", "plusmn" -> "±",
    "sup2" -> "²", "sup3" -> "³", "acute" -> "´",
    "micro" -> "µ", "para" -> "¶", "middot" -> "·",
    "cedil" -> "¸", "sup1" -> "¹", "ordm" -> "º",
    "raquo" -> "»", "frac14" -> "¼", "frac12" -> "½",
    "frac34" -> "¾", "iquest" -> "¿",
    "Agrave" -> "À", "Aacute" -> "Á", "Acirc" -> "Â",
    "Atilde" -> "Ã", "Auml" -> "Ä", "Aring" -> "Å",
    "AElig" -> "Æ", "Ccedil" -> "Ç", "Egrave" -> "È",
    "Eacute" -> "É", "Ecirc" -> "Ê", "Euml" -> "Ë",
    "Igrave" -> "Ì", "Iacute" -> "Í", "Icirc" -> "Î",
    "Iuml" -> "Ï", "ETH" -> "Ð", "Ntilde" -> "Ñ",
    "Ograve" -> "Ò", "Oacute" -> "Ó", "Ocirc" -> "Ô",
    "Otilde" -> "Õ", "Ouml" -> "Ö", "times" -> "×",
    "Oslash" -> "Ø", "Ugrave" -> "Ù", "Uacute" -> "Ú",
    "Ucirc" -> "Û", "Uuml" -> "Ü", "Yacute" -> "Ý",
    "THORN" -> "Þ", "szlig" -> "ß",
    "agrave" -> "à", "aacute" -> "á", "acirc" -> "â",
    "atilde" -> "ã", "auml" -> "ä", "aring" -> "å",
    "aelig" -> "æ", "ccedil" -> "ç", "egrave" -> "è",
    "eacute" -> "é", "ecirc" -> "ê", "euml" -> "ë",
    "igrave" -> "ì", "iacute" -> "í", "icirc" -> "î",
    "iuml" -> "ï", "eth" -> "ð", "ntilde" -> "ñ",
    "ograve" -> "ò", "oacute" -> "ó", "ocirc" -> "ô",
    "otilde" -> "õ", "ouml" -> "ö", "divide" -> "÷",
    "oslash" -> "ø", "ugrave" -> "ù", "uacute" -> "ú",
    "ucirc" -> "û", "uuml" -> "ü", "yacute" -> "ý",
    "thorn" -> "þ", "yuml" -> "ÿ",
    "OElig" -> "Œ", "oelig" -> "œ", "Scaron" -> "Š",
    "scaron" -> "š", "Yuml" -> "Ÿ", "fnof" -> "ƒ",
    "circ" -> "ˆ", "tilde" -> "˜",
    "Alpha" -> "Α", "Beta" -> "Β", "Gamma" -> "Γ",
    "Delta" -> "Δ", "Epsilon" -> "Ε", "Zeta" -> "Ζ",
    "Eta" -> "Η", "Theta" -> "Θ", "Iota" -> "Ι",
    "Kappa" -> "Κ", "Lambda" -> "Λ", "Mu" -> "Μ",
    "Nu" -> "Ν", "Xi" -> "Ξ", "Omicron" -> "Ο",
    "Pi" -> "Π", "Rho" -> "Ρ", "Sigma" -> "Σ",
    "Tau" -> "Τ", "Upsilon" -> "Υ", "Phi" -> "Φ",
    "Chi" -> "Χ", "Psi" -> "Ψ", "Omega" -> "Ω",
    "alpha" -> "α", "beta" -> "β", "gamma" -> "γ",
    "delta" -> "δ", "epsilon" -> "ε", "zeta" -> "ζ",
    "eta" -> "η", "theta" -> "θ", "iota" -> "ι",
    "kappa" -> "κ", "lambda" -> "λ", "mu" -> "μ",
    "nu" -> "ν", "xi" -> "ξ", "omicron" -> "ο",
    "pi" -> "π", "rho" -> "ρ", "sigmaf" -> "ς",
    "sigma" -> "σ", "tau" -> "τ", "upsilon" -> "υ",
    "phi" -> "φ", "chi" -> "χ", "psi" -> "ψ",
    "omega" -> "ω", "thetasym" -> "ϑ", "upsih" -> "ϒ",
    "piv" -> "ϖ",
    "ensp" -> " ", "emsp" -> " ", "thinsp" -> " ",
    "zwnj" -> "‌", "zwj" -> "‍", "lrm" -> "‎",
    "rlm" -> "‏", "ndash" -> "–", "mdash" -> "—",
    "lsquo" -> "‘", "rsquo" -> "’", "sbquo" -> "‚",
    "ldquo" -> "“", "rdquo" -> "”", "bdquo" -> "„",
    "dagger" -> "†", "Dagger" -> "‡", "bull" -> "•",
    "hellip" -> "…", "permil" -> "‰", "prime" -> "′",
    "Prime" -> "″", "lsaquo" -> "‹", "rsaquo" -> "›",
    "oline" -> "‾", "frasl" -> "⁄", "euro" -> "€",
    "image" -> "ℑ", "weierp" -> "℘", "real" -> "ℜ",
    "trade" -> "™", "alefsym" -> "ℵ", "larr" -> "←",
    "uarr" -> "↑", "rarr" -> "→", "darr" -> "↓",
    "harr" -> "↔", "crarr" -> "↵", "lArr" -> "⇐",
    "uArr" -> "⇑", "rArr" -> "⇒", "dArr" -> "⇓",
    "hArr" -> "⇔", "forall" -> "∀", "part" -> "∂",
    "exist" -> "∃", "empty" -> "∅", "nabla" -> "∇",
    "isin" -> "∈", "notin" -> "∉", "ni" -> "∋",
    "prod" -> "∏", "sum" -> "∑", "minus" -> "−",
    "lowast" -> "∗", "radic" -> "√", "prop" -> "∝",
    "infin" -> "∞", "ang" -> "∠", "and" -> "∧",
    "or" -> "∨", "cap" -> "∩", "cup" -> "∪",
    "int" -> "∫", "there4" -> "∴", "sim" -> "∼",
    "cong" -> "≅", "asymp" -> "≈", "ne" -> "≠",
    "equiv" -> "≡", "le" -> "≤", "ge" -> "≥",
    "sub" -> "⊂", "sup" -> "⊃", "nsub" -> "⊄",
    "sube" -> "⊆", "supe" -> "⊇", "oplus" -> "⊕",
    "otimes" -> "⊗", "perp" -> "⊥", "sdot" -> "⋅",
    "lceil" -> "⌈", "rceil" -> "⌉", "lfloor" -> "⌊",
    "rfloor" -> "⌋", "lang" -> "〈", "rang" -> "〉",
    "loz" -> "◊", "spades" -> "♠", "clubs" -> "♣",
    "hearts" -> "♥", "diams" -> "♦",
  )

  /** Decode HTML character references; unknown/unterminated ones pass
    * through unchanged. Single pass, no re-decoding of produced '&'. */
  def decode(s: String): String = {
    if (s == null || s.isEmpty || s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        // entity names/numbers are short; a far-away ';' means no entity
        if (semi < 0 || semi - i > 10 || semi == i + 1) { sb.append(c); i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          if (body.charAt(0) == '#') {
            val numStr = body.substring(1)
            val cp =
              try {
                if (numStr.nonEmpty && (numStr.charAt(0) == 'x' || numStr.charAt(0) == 'X'))
                  Integer.parseInt(numStr.substring(1), 16)
                else Integer.parseInt(numStr, 10)
              } catch { case _: NumberFormatException => -1 }
            if (cp >= 0 && cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff)) {
              sb.appendCodePoint(cp); i = semi + 1
            } else { sb.append(c); i += 1 }
          } else named.get(body) match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None      => sb.append(c); i += 1
          }
        }
      }
    }
    sb.toString
  }
}

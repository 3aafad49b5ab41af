"""Additional hand-written question phrasings for the natural corpus.

Keyed person -> family -> [phrasings]; the assembler and lint attach each
list to that person's first QA of the family (the base birthplace QA
included), so these scale the question count without touching answers or
documents. Every phrasing is checked by tools/lint_natural_corpus.py
against the family-agnostic extractor before it can ship.
"""

EXTRA_QUESTIONS = {
    "Steven Spielberg": {
        "birthplace": [
            "Name the city where the director of Jaws was born.",
            "The man who directed Jaws was born in which Ohio city?",
            "Which American city saw the birth of the director of Jaws?",
        ],
        "award": [
            "For Schindler's List, the director of Jaws won which award?",
        ],
        "employer": [
            "The filmmaker who directed Jaws helped found which studio in the 1990s?",
        ],
    },
    "Alfred Hitchcock": {
        "birthplace": [
            "Name the district where the director of Psycho was born.",
            "The man who directed Rear Window was born on the outskirts of London in which district?",
            "Which district of London was the director of Rear Window born in?",
        ],
        "employer": [
            "Which studio gave the director of Rear Window his start designing title cards?",
        ],
    },
    "Akira Kurosawa": {
        "birthplace": [
            "Name the city where the director of Seven Samurai was born.",
            "The man who directed Seven Samurai was born in a ward of which city?",
            "Which Japanese city was the director of Seven Samurai born in?",
        ],
        "employer": [
            "Which studio released most of the films of the director of Seven Samurai?",
        ],
    },
    "Stanley Kubrick": {
        "birthplace": [
            "Name the city where the director of 2001: A Space Odyssey was born.",
            "The man who directed 2001: A Space Odyssey was born in which city in 1928?",
        ],
        "employer": [
            "Before films, the director of 2001: A Space Odyssey photographed for which magazine?",
        ],
    },
    "Ingmar Bergman": {
        "birthplace": [
            "Name the Swedish city where the director of Persona was born.",
            "The man who wrote and directed Persona was born in which city in 1918?",
        ],
        "location": [
            "Much of the later work of the director of Persona was shot on which island?",
        ],
    },
    "Federico Fellini": {
        "birthplace": [
            "Name the seaside town where the director of 8½ was born.",
            "The man who directed 8½ was born in which Italian seaside town?",
        ],
        "employer": [
            "The young director of 8½ drew cartoons for which Rome magazine?",
        ],
    },
    "Bong Joon-ho": {
        "birthplace": [
            "Name the South Korean city where the director of Parasite was born.",
            "The man who directed Parasite was born in which city in 1969?",
        ],
        "education": [
            "Which Seoul university taught sociology to the director of Parasite?",
        ],
    },
    "Agnès Varda": {
        "birthplace": [
            "Name the Brussels municipality where the director of Cléo from 5 to 7 was born.",
            "The woman who directed Cléo from 5 to 7 was born in which municipality of Brussels?",
        ],
    },
    "Ernest Hemingway": {
        "birthplace": [
            "Name the Illinois town where the author of The Old Man and the Sea was born.",
            "The man who wrote The Old Man and the Sea was born in which town in 1899?",
            "Which Illinois town saw the birth of the author of The Old Man and the Sea?",
        ],
        "award": [
            "The man who wrote The Old Man and the Sea received which prize in 1954?",
        ],
        "employer": [
            "Which newspaper took on the young author of The Old Man and the Sea as a reporter?",
        ],
    },
    "Gabriel García Márquez": {
        "birthplace": [
            "Name the Colombian town where the author of One Hundred Years of Solitude was born.",
            "The man who wrote One Hundred Years of Solitude was born in which small town?",
        ],
        "award": [
            "The man who wrote One Hundred Years of Solitude accepted which prize in 1982?",
        ],
    },
    "Haruki Murakami": {
        "birthplace": [
            "Name the Japanese city where the author of Norwegian Wood was born.",
            "The man who wrote Norwegian Wood was born in which city in 1949?",
        ],
        "education": [
            "Which Tokyo university taught drama to the author of Norwegian Wood?",
        ],
    },
    "Jane Austen": {
        "birthplace": [
            "Name the Hampshire village where the author of Pride and Prejudice was born.",
            "The woman who wrote Pride and Prejudice was born in which village in 1775?",
        ],
        "location": [
            "The author of Pride and Prejudice spent her last years in which village?",
        ],
    },
    "Franz Kafka": {
        "birthplace": [
            "Name the city where the author of The Trial was born.",
            "The man who wrote The Trial was born in which city in 1883?",
        ],
        "education": [
            "Which Prague university granted a law degree to the author of The Trial?",
        ],
    },
    "Toni Morrison": {
        "birthplace": [
            "Name the Ohio town where the author of Beloved was born.",
            "The woman who wrote Beloved was born in which steel town?",
        ],
        "award": [
            "The woman who wrote Beloved was awarded which prize in 1993?",
        ],
        "employer": [
            "Which publisher employed the author of Beloved as a senior editor for years?",
        ],
    },
    "Fyodor Dostoevsky": {
        "birthplace": [
            "Name the city where the author of Crime and Punishment was born.",
            "The man who wrote Crime and Punishment was born in which city in 1821?",
        ],
        "education": [
            "At which academy in Saint Petersburg did the author of Crime and Punishment train?",
        ],
    },
    "Albert Einstein": {
        "birthplace": [
            "Name the German city where the creator of general relativity was born.",
            "The man who created general relativity was born in which city of Württemberg?",
        ],
        "award": [
            "The man who created general relativity received which prize for the photoelectric effect?",
        ],
        "location": [
            "While examining patents, the creator of general relativity lived in which city?",
        ],
    },
    "Marie Curie": {
        "birthplace": [
            "Name the city where the discoverer of polonium was born.",
            "The woman who discovered polonium was born in which city under Russian rule?",
        ],
        "award": [
            "The woman who discovered polonium received which prize in 1911?",
        ],
    },
    "Charles Darwin": {
        "birthplace": [
            "Name the English town where the author of On the Origin of Species was born.",
            "The man who wrote On the Origin of Species was born in which town in 1809?",
        ],
        "award": [
            "The man who wrote On the Origin of Species received which medal from the Royal Society?",
        ],
    },
    "Alexander Fleming": {
        "birthplace": [
            "Name the Ayrshire town near which the discoverer of penicillin was born.",
            "The man who discovered penicillin was born near which town in 1881?",
        ],
        "award": [
            "The man who discovered penicillin shared which prize in medicine in 1945?",
        ],
    },
    "Tim Berners-Lee": {
        "birthplace": [
            "Name the city where the inventor of the World Wide Web was born.",
            "The man who invented the World Wide Web was born in which city in 1955?",
        ],
        "education": [
            "Which Oxford college taught physics to the inventor of the World Wide Web?",
        ],
    },
    "Nikola Tesla": {
        "birthplace": [
            "Name the village where the inventor of the AC induction motor was born.",
            "The man who invented the AC induction motor was born in which village in 1856?",
        ],
        "employer": [
            "Which company briefly employed the inventor of the AC induction motor in New York?",
        ],
    },
    "Francis Crick": {
        "birthplace": [
            "Name the English town near which the co-discoverer of the double helix was born.",
            "The man who co-discovered the double helix was born near which town in 1916?",
        ],
        "award": [
            "The man who co-discovered the double helix shared which prize in 1962?",
        ],
    },
    "Michael Jackson": {
        "birthplace": [
            "Name the Indiana city where the performer of Thriller was born.",
            "The singer behind Thriller was born in which city in 1958?",
        ],
        "award": [
            "The singer behind Thriller won eight of which award in one night in 1984?",
        ],
    },
    "John Lennon": {
        "birthplace": [
            "Name the city where the writer of Imagine was born.",
            "The man who wrote Imagine was born in which city in 1940?",
        ],
        "organization": [
            "Which band did the man who wrote Imagine help found?",
        ],
    },
    "Prince (musician)": {
        "birthplace": [
            "Name the Minnesota city where the performer of Purple Rain was born.",
            "The musician behind Purple Rain was born in which city in 1958?",
        ],
    },
    "Freddie Mercury": {
        "birthplace": [
            "Name the Zanzibar town where the writer of Bohemian Rhapsody was born.",
            "The singer who wrote Bohemian Rhapsody was born in which town in 1946?",
        ],
        "organization": [
            "Which rock band did the writer of Bohemian Rhapsody front?",
        ],
    },
    "Bob Dylan": {
        "birthplace": [
            "Name the Minnesota city where the writer of Like a Rolling Stone was born.",
            "The songwriter behind Like a Rolling Stone was born in which city in 1941?",
        ],
        "award": [
            "The songwriter behind Like a Rolling Stone received which prize in 2016?",
        ],
    },
    "Antonio Vivaldi": {
        "birthplace": [
            "Name the city where the composer of The Four Seasons was born.",
            "The man who composed The Four Seasons was born in which city in 1678?",
        ],
        "instrument": [
            "The composer of The Four Seasons taught orphan girls to play which instrument?",
        ],
    },
    "Pablo Picasso": {
        "birthplace": [
            "Name the Spanish city where the painter of Guernica was born.",
            "The man who painted Guernica was born on Spain's southern coast in which city?",
        ],
        "organization": [
            "The painter of Guernica developed which movement with Georges Braque in Paris?",
        ],
    },
    "Vincent van Gogh": {
        "birthplace": [
            "Name the Dutch village where the painter of The Starry Night was born.",
            "The man who painted The Starry Night was born in which village in 1853?",
        ],
        "employer": [
            "The young painter of The Starry Night worked for which art dealership?",
        ],
    },
    "Salvador Dalí": {
        "birthplace": [
            "Name the Catalan town where the painter of The Persistence of Memory was born.",
            "The man who painted The Persistence of Memory was born in which town in 1904?",
        ],
    },
    "Johannes Vermeer": {
        "birthplace": [
            "Name the city where the painter of Girl with a Pearl Earring was born.",
            "The man who painted Girl with a Pearl Earring spent his whole life in which city?",
        ],
    },
    "Antoni Gaudí": {
        "birthplace": [
            "Name the town usually credited as the birthplace of the architect of the Sagrada Família.",
            "The architect of the Sagrada Família was born in 1852 in which town, by the usual account?",
        ],
        "location": [
            "The architect of the Sagrada Família built nearly all of his work around which city?",
        ],
    },
    "Frank Lloyd Wright": {
        "birthplace": [
            "Name the Wisconsin town where the architect of Fallingwater was born.",
            "The man who designed Fallingwater was born in which town in 1867?",
        ],
        "organization": [
            "The architect of Fallingwater founded which fellowship for apprentices?",
        ],
    },
    "Jørn Utzon": {
        "birthplace": [
            "Name the city where the designer of the Sydney Opera House was born.",
            "The architect behind the Sydney Opera House was born in which city in 1918?",
        ],
        "award": [
            "The architect behind the Sydney Opera House received which prize in 2003?",
        ],
    },
    "Alexey Pajitnov": {
        "birthplace": [
            "Name the city where the creator of Tetris was born.",
            "The man who created Tetris was born in which city in 1956?",
        ],
    },
    "Shigeru Miyamoto": {
        "birthplace": [
            "Name the town near Kyoto where the designer of Super Mario Bros. was born.",
            "The man who designed Super Mario Bros. was born in which small town?",
        ],
        "employer": [
            "The designer of Super Mario Bros. joined which company as its first staff artist?",
        ],
    },
    "Henry Ford": {
        "birthplace": [
            "Name the Michigan township where the creator of the Model T was born.",
            "The man behind the Model T was born on a farm in which township?",
        ],
        "employer": [
            "Before cars, the creator of the Model T engineered for which company?",
        ],
    },
    "Steve Jobs": {
        "birthplace": [
            "Name the city where the creator of the Macintosh was born.",
            "The man behind the Macintosh was born in which city in 1955?",
        ],
        "organization": [
            "The creator of the Macintosh co-founded which company with Steve Wozniak?",
        ],
    },
    "Thor Heyerdahl": {
        "birthplace": [
            "Name the Norwegian town where the leader of the Kon-Tiki expedition was born.",
            "The man who led the Kon-Tiki expedition was born in which town in 1914?",
        ],
    },
    "Neil Armstrong": {
        "birthplace": [
            "Name the Ohio town near which the commander of Apollo 11 was born.",
            "The man who commanded Apollo 11 was born near which town in 1930?",
        ],
        "employer": [
            "After NASA, the commander of Apollo 11 taught engineering in which city?",
        ],
    },
    "Stephen Jay Gould": {
        "birthplace": [
            "Name the city where the proposer of punctuated equilibrium was born.",
            "The man who proposed punctuated equilibrium was born in which city in 1941?",
        ],
        "employer": [
            "Which university had the proposer of punctuated equilibrium on its faculty?",
        ],
    },
    "Lin-Manuel Miranda": {
        "birthplace": [
            "Name the city where the creator of Hamilton was born.",
            "The man who created Hamilton was born in which city in 1980?",
        ],
        "award": [
            "The creator of Hamilton earned which prize for drama in 2016?",
        ],
    },
    "Mary Shelley": {
        "birthplace": [
            "Name the city where the author of Frankenstein was born.",
            "The woman who wrote Frankenstein was born in which city in 1797?",
        ],
    },
    "Hokusai": {
        "birthplace": [
            "Name the city where the creator of The Great Wave off Kanagawa was born.",
            "The artist behind The Great Wave off Kanagawa was born in which city in 1760?",
        ],
    },
    "Claude Debussy": {
        "birthplace": [
            "Name the town west of Paris where the composer of Clair de lune was born.",
            "The man who composed Clair de lune was born in which town in 1862?",
        ],
        "education": [
            "The composer of Clair de lune entered which conservatoire at ten?",
        ],
    },
    "Leo Tolstoy": {
        "birthplace": [
            "Name the family estate where the author of War and Peace was born.",
            "The man who wrote War and Peace was born at which estate south of Moscow?",
        ],
    },
    "Pyotr Tchaikovsky": {
        "birthplace": [
            "Name the Urals factory town where the composer of The Nutcracker was born.",
            "The man who composed The Nutcracker was born in which town in 1840?",
        ],
        "education": [
            "The composer of The Nutcracker trained at which conservatory under Anton Rubinstein?",
        ],
    },
    "Stephen Hawking": {
        "birthplace": [
            "Name the city where the author of A Brief History of Time was born.",
            "The man who wrote A Brief History of Time was born in which city in 1942?",
        ],
    },
    "Simone de Beauvoir": {
        "birthplace": [
            "Name the city where the author of The Second Sex was born.",
            "The woman who wrote The Second Sex was born in which city in 1908?",
        ],
        "organization": [
            "After the war, the author of The Second Sex edited which journal?",
        ],
    },
    "Rachel Carson": {
        "birthplace": [
            "Name the Pennsylvania town where the author of Silent Spring was born.",
            "The woman who wrote Silent Spring was born in which town in 1907?",
        ],
        "award": [
            "The woman who wrote Silent Spring won which award for The Sea Around Us?",
        ],
    },
    "Louis Armstrong": {
        "birthplace": [
            "Name the city where the performer of What a Wonderful World was born.",
            "The trumpeter who recorded What a Wonderful World was born in which city in 1901?",
        ],
        "instrument": [
            "The man who recorded What a Wonderful World played which instrument?",
        ],
    },
    "Frida Kahlo": {
        "birthplace": [
            "Name the part of Mexico City where the painter of The Two Fridas was born.",
            "The woman who painted The Two Fridas was born in which place in 1907?",
        ],
        "organization": [
            "Which muralist became the husband of the painter of The Two Fridas?",
        ],
    },
    "Isaac Newton": {
        "birthplace": [
            "Name the Lincolnshire manor farm where the author of the Principia was born.",
            "The man who wrote the Principia was born at which manor farm in 1642?",
        ],
        "education": [
            "Which Cambridge college taught the author of the Principia?",
        ],
    },
    "George Orwell": {
        "birthplace": [
            "Name the Indian town where the author of Nineteen Eighty-Four was born.",
            "The man who wrote Nineteen Eighty-Four was born in which town in 1903?",
        ],
        "employer": [
            "The author of Nineteen Eighty-Four wrote a regular column for which magazine?",
        ],
    },
    "Alexander Graham Bell": {
        "birthplace": [
            "Name the Scottish city where the inventor of the telephone was born.",
            "The man who invented the telephone was born in which city in 1847?",
        ],
        "employer": [
            "The inventor of the telephone was a speech teacher at which American university?",
        ],
    },
    "Wolfgang Amadeus Mozart": {
        "birthplace": [
            "Name the city where the composer of The Magic Flute was born.",
            "The man who composed The Magic Flute was born in which city in 1756?",
        ],
    },
    "Nelson Mandela": {
        "birthplace": [
            "Name the village where the author of Long Walk to Freedom was born.",
            "The man who wrote Long Walk to Freedom was born in which village in 1918?",
        ],
        "award": [
            "The author of Long Walk to Freedom shared which prize in 1993?",
        ],
    },
    "Dmitri Mendeleev": {
        "birthplace": [
            "Name the Siberian town where the creator of the periodic table was born.",
            "The man who created the periodic table was born in which town in 1834?",
        ],
        "employer": [
            "Which university kept the creator of the periodic table on its chemistry faculty?",
        ],
    },
    "Miles Davis": {
        "birthplace": [
            "Name the Illinois town where the trumpeter behind Kind of Blue was born.",
            "The man who made Kind of Blue was born in which town in 1926?",
        ],
        "instrument": [
            "The trumpeter behind Kind of Blue played which instrument?",
        ],
    },
    "J.R.R. Tolkien": {
        "birthplace": [
            "Name the city where the author of The Hobbit was born.",
            "The man who wrote The Hobbit was born in which city in 1892?",
        ],
        "organization": [
            "The author of The Hobbit read drafts to which circle of friends?",
        ],
    },
    "Alfred Nobel": {
        "birthplace": [
            "Name the city where the inventor of dynamite was born.",
            "The man who invented dynamite was born in which city in 1833?",
        ],
    },
    "Jane Goodall": {
        "birthplace": [
            "Name the city where the founder of the Gombe chimpanzee study was born.",
            "The woman who began the Gombe chimpanzee study was born in which city in 1934?",
        ],
    },
}

# second sweep of phrasings, merged identically (separate dict only to
# keep authoring batches reviewable)
EXTRA_QUESTIONS_2 = {
    "Steven Spielberg": {
        "award": [
            "Which award went to the director of Jaws in 1994?",
            "Schindler's List won its director — the man behind Jaws — which award?",
        ],
        "education": [
            "The man who directed Jaws completed his film degree at which state university?",
            "Which university finally granted the director of Jaws his film degree?",
        ],
        "employer": [
            "Which studio did the man behind Jaws co-found with two partners?",
        ],
    },
    "Alfred Hitchcock": {
        "education": [
            "Which London college did the director of Psycho attend as a boy?",
            "The man who directed Psycho was educated at which college?",
        ],
        "award": [
            "Which award came to the director of Rear Window from the American Film Institute?",
            "The American Film Institute honoured the director of Psycho with which award?",
        ],
    },
    "Akira Kurosawa": {
        "award": [
            "Which honorary award went to the director of Seven Samurai in 1990?",
        ],
        "employer": [
            "Most films of the man who directed Seven Samurai were made at which studio?",
        ],
    },
    "Stanley Kubrick": {
        "award": [
            "Which award did the effects of 2001: A Space Odyssey earn its director?",
        ],
        "employer": [
            "Which magazine hired the future director of 2001: A Space Odyssey as a photographer?",
        ],
    },
    "Ingmar Bergman": {
        "employer": [
            "Which Stockholm theatre was led by the director of Persona?",
            "The man who directed Persona ran which theatre in Stockholm?",
        ],
    },
    "Federico Fellini": {
        "award": [
            "Which awards did the man who directed 8½ win five of?",
        ],
        "employer": [
            "Which satirical magazine printed the cartoons of the future director of 8½?",
        ],
    },
    "Bong Joon-ho": {
        "award": [
            "Which award went to the director of Parasite in 2020?",
            "The man who directed Parasite won which directing award in 2020?",
        ],
    },
    "Agnès Varda": {
        "award": [
            "Which honorary award went to the director of Cléo from 5 to 7 in 2017?",
        ],
        "employer": [
            "Which theatre kept the director of Cléo from 5 to 7 as its official photographer?",
        ],
    },
    "Ernest Hemingway": {
        "award": [
            "Which literary prize came to the author of The Old Man and the Sea in 1954?",
        ],
        "organization": [
            "Which organization had the author of The Old Man and the Sea driving ambulances in Italy?",
            "The man who wrote The Old Man and the Sea drove ambulances for which organization?",
        ],
    },
    "Gabriel García Márquez": {
        "employer": [
            "Which Bogotá newspaper printed the reporting of the author of One Hundred Years of Solitude?",
            "The young author of One Hundred Years of Solitude reported for which newspaper?",
        ],
    },
    "Haruki Murakami": {
        "organization": [
            "Which jazz bar did the author of Norwegian Wood run before writing full-time?",
            "The man who wrote Norwegian Wood ran a jazz bar with what name?",
        ],
    },
    "Jane Austen": {
        "organization": [
            "Which London publisher handled the books of the author of Pride and Prejudice?",
        ],
        "location": [
            "In which village did the author of Pride and Prejudice live out her final years?",
        ],
    },
    "Franz Kafka": {
        "employer": [
            "Which institute had the author of The Trial handling insurance claims by day?",
            "The man who wrote The Trial worked at which insurance institute?",
        ],
    },
    "Toni Morrison": {
        "employer": [
            "Which university hired the author of Beloved to teach writing?",
            "The woman who wrote Beloved taught writing at which university?",
        ],
    },
    "Fyodor Dostoevsky": {
        "location": [
            "To which region was the author of Crime and Punishment exiled to a prison camp?",
            "The man who wrote Crime and Punishment was exiled to a camp in which region?",
        ],
    },
    "Albert Einstein": {
        "award": [
            "Which prize came to the creator of general relativity in 1921?",
        ],
        "location": [
            "In which town did the man who created general relativity finally settle in America?",
        ],
    },
    "Marie Curie": {
        "education": [
            "Which Paris institution did the discoverer of polonium move to study at?",
            "The woman who discovered polonium studied at which institution in Paris?",
        ],
    },
    "Charles Darwin": {
        "education": [
            "Which Cambridge college educated the author of On the Origin of Species?",
        ],
        "organization": [
            "Which survey ship carried the author of On the Origin of Species for five years?",
            "The man who wrote On the Origin of Species voyaged aboard which ship?",
        ],
    },
    "Alexander Fleming": {
        "employer": [
            "Which London hospital was home to the research of the discoverer of penicillin?",
            "The man who discovered penicillin spent his research career at which hospital?",
        ],
    },
    "Tim Berners-Lee": {
        "education": [
            "Which college of Oxford educated the inventor of the World Wide Web?",
        ],
        "location": [
            "The inventor of the World Wide Web proposed it at a laboratory near which city?",
        ],
    },
    "Nikola Tesla": {
        "education": [
            "In which city did the inventor of the AC induction motor attend a polytechnic school?",
        ],
        "employer": [
            "On arriving in America, the inventor of the AC induction motor worked for which company?",
        ],
    },
    "Francis Crick": {
        "employer": [
            "Which Cambridge laboratory hosted the double-helix work?",
            "The co-discoverer of the double helix worked out the structure at which laboratory?",
        ],
    },
    "Michael Jackson": {
        "organization": [
            "Which family group did the singer behind Thriller begin performing with?",
        ],
        "award": [
            "Which awards did the performer of Thriller collect eight of in a single night?",
        ],
    },
    "John Lennon": {
        "instrument": [
            "Which instrument did the man who wrote Imagine play in his band?",
            "The man behind Imagine played which instrument in the Beatles?",
        ],
    },
    "Prince (musician)": {
        "award": [
            "Which award did the film Purple Rain earn its performer for the song score?",
        ],
        "organization": [
            "Which complex did the performer of Purple Rain record at?",
        ],
    },
    "Freddie Mercury": {
        "education": [
            "Which London college gave the writer of Bohemian Rhapsody a design diploma?",
            "The singer who wrote Bohemian Rhapsody studied graphic design at which college?",
        ],
    },
    "Bob Dylan": {
        "instrument": [
            "Which instrument did the songwriter behind Like a Rolling Stone play between verses?",
        ],
    },
    "Antonio Vivaldi": {
        "location": [
            "The composer of The Four Seasons died poor in 1741 in which city?",
        ],
        "instrument": [
            "Which instrument were the orphan girls taught to play by the composer of The Four Seasons?",
        ],
    },
    "Pablo Picasso": {
        "education": [
            "Which Madrid academy trained the painter of Guernica?",
            "The man who painted Guernica trained at which academy?",
        ],
    },
    "Vincent van Gogh": {
        "location": [
            "In which village north of Paris did the painter of The Starry Night spend his final months?",
            "The man who painted The Starry Night spent his last months in which village?",
        ],
    },
    "Salvador Dalí": {
        "organization": [
            "Which filmmaker worked with the painter of The Persistence of Memory on an early film?",
            "The man who painted The Persistence of Memory collaborated with which filmmaker?",
        ],
    },
    "Johannes Vermeer": {
        "instrument": [
            "Which costly pigment made the blues of the painter of Girl with a Pearl Earring?",
            "The man who painted Girl with a Pearl Earring used which pigment for his blues?",
        ],
    },
    "Antoni Gaudí": {
        "location": [
            "Which city contains nearly all the built work of the architect of the Sagrada Família?",
        ],
    },
    "Frank Lloyd Wright": {
        "organization": [
            "Which apprentice fellowship did the man who designed Fallingwater found?",
        ],
        "location": [
            "Which museum's spiral closed the career of the architect of Fallingwater?",
        ],
    },
    "Jørn Utzon": {
        "education": [
            "Which academy in Copenhagen trained the designer of the Sydney Opera House?",
        ],
    },
    "Alexey Pajitnov": {
        "employer": [
            "Which computing centre was home to the creator of Tetris?",
            "The man who created Tetris built it at which computing centre?",
        ],
        "location": [
            "Which country did the creator of Tetris emigrate to in 1991?",
        ],
    },
    "Shigeru Miyamoto": {
        "education": [
            "Which college of art taught industrial design to the designer of Super Mario Bros.?",
        ],
    },
    "Henry Ford": {
        "employer": [
            "Which company employed the future creator of the Model T as an engineer?",
        ],
    },
    "Steve Jobs": {
        "organization": [
            "Which company did the man behind the Macintosh co-found with a friend in a garage?",
        ],
        "acquisition": [
            "Which animation studio did the man behind the Macintosh buy after leaving?",
            "The creator of the Macintosh bought which studio?",
        ],
    },
    "Thor Heyerdahl": {
        "education": [
            "In which city did the man who led the Kon-Tiki expedition study zoology?",
        ],
    },
    "Neil Armstrong": {
        "organization": [
            "Which base hosted the rocket-plane test flights of the commander of Apollo 11?",
            "The man who commanded Apollo 11 flew as a test pilot at which base?",
        ],
    },
    "Stephen Jay Gould": {
        "organization": [
            "Which magazine carried the monthly essays of the proposer of punctuated equilibrium?",
            "The man who proposed punctuated equilibrium published monthly essays in which magazine?",
        ],
    },
    "Lin-Manuel Miranda": {
        "education": [
            "Which Connecticut university taught theatre to the creator of Hamilton?",
            "The man who created Hamilton studied theatre at which university?",
        ],
    },
    "Mary Shelley": {
        "organization": [
            "The mother of the author of Frankenstein was which philosopher?",
            "Which poet did the author of Frankenstein elope with to the Continent?",
        ],
    },
    "Claude Debussy": {
        "education": [
            "Which conservatoire took in the composer of Clair de lune at the age of ten?",
        ],
    },
    "Leo Tolstoy": {
        "location": [
            "The siege of which city saw the author of War and Peace serving as an artillery officer?",
        ],
    },
    "Pyotr Tchaikovsky": {
        "education": [
            "Which conservatory trained the composer of The Nutcracker under Anton Rubinstein?",
        ],
    },
    "Stephen Hawking": {
        "employer": [
            "In which university town did the author of A Brief History of Time teach for thirty years?",
            "The man who wrote A Brief History of Time taught in which city?",
        ],
    },
    "Simone de Beauvoir": {
        "organization": [
            "Which journal did the woman who wrote The Second Sex edit with Sartre?",
        ],
    },
    "Rachel Carson": {
        "award": [
            "Which book award went to the author of Silent Spring in 1952?",
        ],
    },
    "Louis Armstrong": {
        "organization": [
            "What nickname did the trumpeter of What a Wonderful World carry?",
        ],
        "instrument": [
            "The performer of What a Wonderful World played which brass instrument?",
        ],
    },
    "Frida Kahlo": {
        "location": [
            "Which blue family house was home to the painter of The Two Fridas?",
        ],
    },
    "Isaac Newton": {
        "employer": [
            "Late in life, the author of the Principia ran which mint?",
        ],
        "organization": [
            "Which society elected the author of the Principia as its president?",
        ],
    },
    "George Orwell": {
        "location": [
            "Which war left the author of Nineteen Eighty-Four shot through the throat?",
        ],
    },
    "Alexander Graham Bell": {
        "organization": [
            "Which telephone company did its inventor help establish in 1877?",
        ],
    },
    "Wolfgang Amadeus Mozart": {
        "location": [
            "Which city did the composer of The Magic Flute move to for freelance work?",
        ],
    },
    "Nelson Mandela": {
        "location": [
            "Which country made the author of Long Walk to Freedom its president in 1994?",
        ],
        "award": [
            "Which peace prize was shared by the author of Long Walk to Freedom?",
        ],
    },
    "Dmitri Mendeleev": {
        "employer": [
            "The man who created the periodic table held a chemistry post at which university?",
        ],
    },
    "Miles Davis": {
        "education": [
            "Which New York school did the trumpeter behind Kind of Blue enrol at?",
        ],
    },
    "J.R.R. Tolkien": {
        "employer": [
            "In which university town did the author of The Hobbit teach Anglo-Saxon?",
        ],
    },
    "Alfred Nobel": {
        "location": [
            "At which site did the inventor of dynamite build his first explosives factory?",
        ],
    },
    "Jane Goodall": {
        "organization": [
            "Which palaeontologist dispatched the founder of the Gombe chimpanzee study to the field?",
        ],
    },
}

for _p, _fams in EXTRA_QUESTIONS_2.items():
    _dst = EXTRA_QUESTIONS.setdefault(_p, {})
    for _f, _qs in _fams.items():
        _dst.setdefault(_f, []).extend(_qs)

# third sweep — syntax variety (inversion, appositive, of-genitive)
EXTRA_QUESTIONS_3 = {
    "Steven Spielberg": {"birthplace": [
        "The birthplace of the director of Jaws is which city?",
        "What city does the director of Jaws come from?"]},
    "Alfred Hitchcock": {"birthplace": [
        "The birthplace of the director of Rear Window is which district?"]},
    "Akira Kurosawa": {"birthplace": [
        "The birthplace of the director of Seven Samurai lies in which city?"]},
    "Stanley Kubrick": {"birthplace": [
        "What city does the director of 2001: A Space Odyssey come from?"]},
    "Ingmar Bergman": {"birthplace": [
        "What city does the director of Persona come from?"]},
    "Federico Fellini": {"birthplace": [
        "What town does the director of 8½ come from?"]},
    "Bong Joon-ho": {"birthplace": [
        "What city does the director of Parasite come from?"]},
    "Agnès Varda": {"birthplace": [
        "What municipality does the director of Cléo from 5 to 7 come from?"]},
    "Ernest Hemingway": {"birthplace": [
        "What town does the author of The Old Man and the Sea come from?"]},
    "Gabriel García Márquez": {"birthplace": [
        "What town does the author of One Hundred Years of Solitude come from?"]},
    "Haruki Murakami": {"birthplace": [
        "What city does the author of Norwegian Wood come from?"]},
    "Jane Austen": {"birthplace": [
        "What village does the author of Pride and Prejudice come from?"]},
    "Franz Kafka": {"birthplace": [
        "What city does the author of The Trial come from?"]},
    "Toni Morrison": {"birthplace": [
        "What town does the author of Beloved come from?"]},
    "Fyodor Dostoevsky": {"birthplace": [
        "What city does the author of Crime and Punishment come from?"]},
    "Albert Einstein": {"birthplace": [
        "What city does the creator of general relativity come from?"]},
    "Marie Curie": {"birthplace": [
        "What city does the discoverer of polonium come from?"]},
    "Charles Darwin": {"birthplace": [
        "What town does the author of On the Origin of Species come from?"]},
    "Alexander Fleming": {"birthplace": [
        "The discoverer of penicillin was born near which Ayrshire town?"]},
    "Tim Berners-Lee": {"birthplace": [
        "What city does the inventor of the World Wide Web come from?"]},
    "Nikola Tesla": {"birthplace": [
        "What village does the inventor of the AC induction motor come from?"]},
    "Francis Crick": {"birthplace": [
        "The co-discoverer of the double helix was born near which English town?"]},
    "Michael Jackson": {"birthplace": [
        "What city does the performer of Thriller come from?"]},
    "John Lennon": {"birthplace": [
        "What city does the writer of Imagine come from?"]},
    "Prince (musician)": {"birthplace": [
        "What city does the performer of Purple Rain come from?"]},
    "Freddie Mercury": {"birthplace": [
        "What town does the writer of Bohemian Rhapsody come from?"]},
    "Bob Dylan": {"birthplace": [
        "What city does the writer of Like a Rolling Stone come from?"]},
    "Antonio Vivaldi": {"birthplace": [
        "What city does the composer of The Four Seasons come from?"]},
    "Pablo Picasso": {"birthplace": [
        "What city does the painter of Guernica come from?"]},
    "Vincent van Gogh": {"birthplace": [
        "What village does the painter of The Starry Night come from?"]},
    "Salvador Dalí": {"birthplace": [
        "What town does the painter of The Persistence of Memory come from?"]},
    "Johannes Vermeer": {"birthplace": [
        "What city does the painter of Girl with a Pearl Earring come from?"]},
    "Frank Lloyd Wright": {"birthplace": [
        "What town does the architect of Fallingwater come from?"]},
    "Jørn Utzon": {"birthplace": [
        "What city does the designer of the Sydney Opera House come from?"]},
    "Alexey Pajitnov": {"birthplace": [
        "What city does the creator of Tetris come from?"]},
    "Shigeru Miyamoto": {"birthplace": [
        "What town does the designer of Super Mario Bros. come from?"]},
    "Henry Ford": {"birthplace": [
        "What township does the creator of the Model T come from?"]},
    "Steve Jobs": {"birthplace": [
        "What city does the creator of the Macintosh come from?"]},
    "Thor Heyerdahl": {"birthplace": [
        "What town does the leader of the Kon-Tiki expedition come from?"]},
    "Neil Armstrong": {"birthplace": [
        "The commander of Apollo 11 was born near which Ohio town?"]},
    "Stephen Jay Gould": {"birthplace": [
        "What city does the proposer of punctuated equilibrium come from?"]},
    "Lin-Manuel Miranda": {"birthplace": [
        "What city does the creator of Hamilton come from?"]},
    "Mary Shelley": {"birthplace": [
        "What city does the author of Frankenstein come from?"]},
    "Hokusai": {"birthplace": [
        "What city does the artist of The Great Wave off Kanagawa come from?"]},
    "Claude Debussy": {"birthplace": [
        "What town does the composer of Clair de lune come from?"]},
    "Leo Tolstoy": {"birthplace": [
        "What estate does the author of War and Peace come from?"]},
    "Pyotr Tchaikovsky": {"birthplace": [
        "What town does the composer of The Nutcracker come from?"]},
    "Stephen Hawking": {"birthplace": [
        "What city does the author of A Brief History of Time come from?"]},
    "Simone de Beauvoir": {"birthplace": [
        "What city does the author of The Second Sex come from?"]},
    "Rachel Carson": {"birthplace": [
        "What town does the author of Silent Spring come from?"]},
    "Louis Armstrong": {"birthplace": [
        "What city does the performer of What a Wonderful World come from?"]},
    "Frida Kahlo": {"birthplace": [
        "What part of Mexico City does the painter of The Two Fridas come from?"]},
    "Isaac Newton": {"birthplace": [
        "What manor farm does the author of the Principia come from?"]},
    "George Orwell": {"birthplace": [
        "What Indian town does the author of Nineteen Eighty-Four come from?"]},
    "Alexander Graham Bell": {"birthplace": [
        "What city does the inventor of the telephone come from?"]},
    "Wolfgang Amadeus Mozart": {"birthplace": [
        "What city does the composer of The Magic Flute come from?"]},
    "Nelson Mandela": {"birthplace": [
        "What village does the author of Long Walk to Freedom come from?"]},
    "Dmitri Mendeleev": {"birthplace": [
        "What Siberian town does the creator of the periodic table come from?"]},
    "Miles Davis": {"birthplace": [
        "What Illinois town does the trumpeter behind Kind of Blue come from?"]},
    "J.R.R. Tolkien": {"birthplace": [
        "What city does the author of The Hobbit come from?"]},
    "Alfred Nobel": {"birthplace": [
        "What city does the inventor of dynamite come from?"]},
    "Jane Goodall": {"birthplace": [
        "What city does the founder of the Gombe chimpanzee study come from?"]},
}

for _p, _fams in EXTRA_QUESTIONS_3.items():
    _dst = EXTRA_QUESTIONS.setdefault(_p, {})
    for _f, _qs in _fams.items():
        _dst.setdefault(_f, []).extend(_qs)

# fourth sweep — "in what ..." interrogatives (distinct from "in which")
EXTRA_QUESTIONS_4 = {
    "Steven Spielberg": {"birthplace": ["In what city was the director of Jaws born?"]},
    "Alfred Hitchcock": {"birthplace": ["In what district was the director of Psycho born?"]},
    "Akira Kurosawa": {"birthplace": ["In what city was the director of Seven Samurai born?"]},
    "Stanley Kubrick": {"birthplace": ["In what city was the director of 2001: A Space Odyssey born?"]},
    "Ingmar Bergman": {"birthplace": ["In what city was the director of Persona born?"]},
    "Federico Fellini": {"birthplace": ["In what town was the director of 8½ born?"]},
    "Bong Joon-ho": {"birthplace": ["In what city was the director of Parasite born?"]},
    "Agnès Varda": {"birthplace": ["In what municipality was the director of Cléo from 5 to 7 born?"]},
    "Ernest Hemingway": {"birthplace": ["In what town was the author of The Old Man and the Sea born?"]},
    "Gabriel García Márquez": {"birthplace": ["In what town was the author of One Hundred Years of Solitude born?"]},
    "Haruki Murakami": {"birthplace": ["In what city was the author of Norwegian Wood born?"]},
    "Jane Austen": {"birthplace": ["In what village was the author of Pride and Prejudice born?"]},
    "Franz Kafka": {"birthplace": ["In what city was the author of The Trial born?"]},
    "Toni Morrison": {"birthplace": ["In what town was the author of Beloved born?"]},
    "Fyodor Dostoevsky": {"birthplace": ["In what city was the author of Crime and Punishment born?"]},
    "Albert Einstein": {"birthplace": ["In what city was the creator of general relativity born?"]},
    "Marie Curie": {"birthplace": ["In what city was the discoverer of polonium born?"]},
    "Charles Darwin": {"birthplace": ["In what town was the author of On the Origin of Species born?"]},
    "Alexander Fleming": {"birthplace": ["Near what town was the discoverer of penicillin born?"]},
    "Tim Berners-Lee": {"birthplace": ["In what city was the inventor of the World Wide Web born?"]},
    "Nikola Tesla": {"birthplace": ["In what village was the inventor of the AC induction motor born?"]},
    "Francis Crick": {"birthplace": ["Near what town was the co-discoverer of the double helix born?"]},
    "Michael Jackson": {"birthplace": ["In what city was the performer of Thriller born?"]},
    "John Lennon": {"birthplace": ["In what city was the writer of Imagine born?"]},
    "Prince (musician)": {"birthplace": ["In what city was the performer of Purple Rain born?"]},
    "Freddie Mercury": {"birthplace": ["In what town was the writer of Bohemian Rhapsody born?"]},
    "Bob Dylan": {"birthplace": ["In what city was the writer of Like a Rolling Stone born?"]},
    "Antonio Vivaldi": {"birthplace": ["In what city was the composer of The Four Seasons born?"]},
    "Pablo Picasso": {"birthplace": ["In what city was the painter of Guernica born?"]},
    "Vincent van Gogh": {"birthplace": ["In what village was the painter of The Starry Night born?"]},
    "Salvador Dalí": {"birthplace": ["In what town was the painter of The Persistence of Memory born?"]},
    "Johannes Vermeer": {"birthplace": ["In what city was the painter of Girl with a Pearl Earring born?"]},
    "Frank Lloyd Wright": {"birthplace": ["In what town was the architect of Fallingwater born?"]},
    "Jørn Utzon": {"birthplace": ["In what city was the designer of the Sydney Opera House born?"]},
    "Alexey Pajitnov": {"birthplace": ["In what city was the creator of Tetris born?"]},
    "Shigeru Miyamoto": {"birthplace": ["In what town was the designer of Super Mario Bros. born?"]},
    "Henry Ford": {"birthplace": ["In what township was the creator of the Model T born?"]},
    "Steve Jobs": {"birthplace": ["In what city was the creator of the Macintosh born?"]},
    "Thor Heyerdahl": {"birthplace": ["In what town was the leader of the Kon-Tiki expedition born?"]},
    "Neil Armstrong": {"birthplace": ["Near what town was the commander of Apollo 11 born?"]},
    "Stephen Jay Gould": {"birthplace": ["In what city was the proposer of punctuated equilibrium born?"]},
    "Lin-Manuel Miranda": {"birthplace": ["In what city was the creator of Hamilton born?"]},
    "Mary Shelley": {"birthplace": ["In what city was the author of Frankenstein born?"]},
    "Hokusai": {"birthplace": ["In what city was the creator of The Great Wave off Kanagawa born?"]},
    "Claude Debussy": {"birthplace": ["In what town was the composer of Clair de lune born?"]},
    "Leo Tolstoy": {"birthplace": ["At what estate was the author of War and Peace born?"]},
    "Pyotr Tchaikovsky": {"birthplace": ["In what town was the composer of The Nutcracker born?"]},
    "Stephen Hawking": {"birthplace": ["In what city was the author of A Brief History of Time born?"]},
    "Simone de Beauvoir": {"birthplace": ["In what city was the author of The Second Sex born?"]},
    "Rachel Carson": {"birthplace": ["In what town was the author of Silent Spring born?"]},
    "Louis Armstrong": {"birthplace": ["In what city was the performer of What a Wonderful World born?"]},
    "Frida Kahlo": {"birthplace": ["In what part of Mexico City was the painter of The Two Fridas born?"]},
    "Isaac Newton": {"birthplace": ["At what manor farm was the author of the Principia born?"]},
    "George Orwell": {"birthplace": ["In what town was the author of Nineteen Eighty-Four born?"]},
    "Alexander Graham Bell": {"birthplace": ["In what city was the inventor of the telephone born?"]},
    "Wolfgang Amadeus Mozart": {"birthplace": ["In what city was the composer of The Magic Flute born?"]},
    "Nelson Mandela": {"birthplace": ["In what village was the author of Long Walk to Freedom born?"]},
    "Dmitri Mendeleev": {"birthplace": ["In what town was the creator of the periodic table born?"]},
    "Miles Davis": {"birthplace": ["In what town was the trumpeter behind Kind of Blue born?"]},
    "J.R.R. Tolkien": {"birthplace": ["In what city was the author of The Hobbit born?"]},
    "Alfred Nobel": {"birthplace": ["In what city was the inventor of dynamite born?"]},
    "Jane Goodall": {"birthplace": ["In what city was the founder of the Gombe chimpanzee study born?"]},
}

for _p, _fams in EXTRA_QUESTIONS_4.items():
    _dst = EXTRA_QUESTIONS.setdefault(_p, {})
    for _f, _qs in _fams.items():
        _dst.setdefault(_f, []).extend(_qs)
